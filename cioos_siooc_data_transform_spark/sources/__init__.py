"""Sources: IOS ASCII observation files, GeoJSON polygon dimensions,
file-catalog discovery (SURVEY.md §2.1)."""

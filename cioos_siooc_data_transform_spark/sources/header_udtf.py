"""Python UDTF surface for IOS header exploration (SURVEY.md §2.10 U4 —
the reference needs no UDTF; this is the table-function API a SQL user
expects for ad-hoc header digging without the full parse pipeline).

    spark.udtf.register("ios_header_kv", ParseHeaderUDTF)
    spark.sql("SELECT t.* FROM files, LATERAL ios_header_kv(files.text) t")

Yields one row per (section, key, value) pair across the header tree.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="section string, key string, value string")
class ParseHeaderUDTF:
    def eval(self, text: str):  # noqa: D102 — UDTF contract
        from cioos_siooc_data_transform_spark.sources.ios_format import (
            COMMENT_SECTIONS,
            get_comments_like,
            get_section,
            list_sections,
            split_lines,
        )

        if text is None:
            return
        lines = split_lines(text)
        for section in list_sections(lines):
            if section.split()[0] in COMMENT_SECTIONS:
                for k, v in get_comments_like(lines, section).items():
                    yield (section, k, v)
            else:
                for k, v in get_section(lines, section).items():
                    if isinstance(v, list):
                        yield (section, k, "\n".join(x.rstrip() for x in v))
                    else:
                        yield (section, k, v.strip())


def register_header_udtf(spark) -> None:
    spark.udtf.register("ios_header_kv", ParseHeaderUDTF)

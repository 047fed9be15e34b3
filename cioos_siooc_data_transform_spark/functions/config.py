""".env-style config parsing (SURVEY.md §2.1 S13 — IDT/utils.py:21-34).

Driver-side (not a data op): key:value lines, '#' comments skipped,
parsing STOPS at the first blank line (the reference's quirk, preserved
and documented — trailing config after a blank line is ignored).
"""

from __future__ import annotations


def parse_env_config(text: str) -> dict[str, str]:
    info: dict[str, str] = {}
    for line in text.splitlines():
        if line.strip() == "":
            break
        if line.strip().startswith("#"):
            continue
        if ":" in line:
            key, _, value = line.partition(":")
            info[key.strip()] = value.strip()
    return info


def import_env_variables(path: str = "./.env") -> dict[str, str]:
    with open(path) as f:
        return parse_env_config(f.read())

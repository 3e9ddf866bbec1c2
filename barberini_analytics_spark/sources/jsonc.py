"""JSONC (JSON-with-comments) config loading (SURVEY §1.1 config-as-data).

Reference: ``JsoncToJson`` converts the facts/aspects/patterns configs
(src/_utils/json_converters.py:25-32) which every ABSA task reads.

Driver-side parse (configs are KBs) + broadcast — the same read-once /
broadcast plan the survey prescribes for lexicon data.
"""

from __future__ import annotations

import json
import re

_LINE_COMMENT = re.compile(r"//[^\n\r]*")
_BLOCK_COMMENT = re.compile(r"/\*.*?\*/", re.DOTALL)
_TRAILING_COMMA = re.compile(r",\s*([}\]])")


def strip_jsonc(text: str) -> str:
    """Remove // and /* */ comments and trailing commas — outside strings.

    Comments inside string literals are preserved by masking strings
    before stripping."""
    strings: list[str] = []

    def _mask(m: re.Match) -> str:
        strings.append(m.group(0))
        return f'"\x00{len(strings) - 1}\x00"'

    masked = re.sub(r'"(?:[^"\\]|\\.)*"', _mask, text)
    masked = _BLOCK_COMMENT.sub("", masked)
    masked = _LINE_COMMENT.sub("", masked)
    masked = _TRAILING_COMMA.sub(r"\1", masked)

    def _unmask(m: re.Match) -> str:
        return strings[int(m.group(1))]

    return re.sub(r'"\x00(\d+)\x00"', _unmask, masked)


def load_jsonc(path: str):
    with open(path, encoding="utf-8") as fh:
        return json.loads(strip_jsonc(fh.read()))

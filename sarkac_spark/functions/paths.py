"""Dot-path field extraction (reference lib/helper/getByPath.js).

The reference addresses JSON leaves by dotted path with ``[i]`` array
indexing (``getByPath.js:3-16`` rewrites ``field[3]`` to ``field.3``).
Spark equivalents:

- over a *struct* column (post ``from_json``): ``col("a.b")`` /
  ``element_at`` for arrays — JVM-side, codegen'd;
- over a raw JSON *string* column: ``get_json_object(col, "$.a.b")``.

Both are null-on-miss, which gives P4 (missing-field filter) for free.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_INDEX_RE = re.compile(r"\[(\d+)\]")


def normalize_path(path: str) -> str:
    """``"a[3].b"`` -> ``"a.3.b"`` — same rewrite as getByPath.js:4."""
    return _INDEX_RE.sub(r".\1", path)


def json_path_expr(json_col: str | Column, path: str) -> Column:
    """Extract a leaf from a JSON *string* column by sarkac dot-path.

    ``[i]`` indexes map to JsonPath ``[i]`` (0-based, same as the
    reference's JS array indexing). Returns a string column (JSON scalar);
    cast at the call site.
    """
    jp = "$"
    for seg in normalize_path(path).split("."):
        if seg == "":
            continue
        jp += f"[{seg}]" if seg.isdigit() else f".{seg}"
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.get_json_object(col, jp)


def struct_path_col(path: str) -> Column:
    """Extract a leaf from *struct* columns (post-``from_json``) by sarkac
    dot-path; array segments use element_at (1-based, hence i+1)."""
    segs = [s for s in normalize_path(path).split(".") if s != ""]
    if not segs:
        raise ValueError("empty path is only valid for scalar-root JSON")
    col: Column | None = None
    for seg in segs:
        if seg.isdigit():
            if col is None:
                raise ValueError(f"path cannot start with an index: {path!r}")
            col = F.element_at(col, int(seg) + 1)
        else:
            col = F.col(seg) if col is None else col.getField(seg)
    return col


def numeric_leaf(json_col: str | Column, path: str) -> Column:
    """The tracked-field extraction: JSON string col + path -> double,
    null on miss or non-numeric (reference tracks only ``number`` leaves,
    FieldIdentifier.js:32-34). ``try_cast`` because Spark 4 runs ANSI mode
    by default and a plain cast would *throw* on a non-numeric leaf where
    the reference silently skips the field."""
    return json_path_expr(json_col, path).try_cast("double")

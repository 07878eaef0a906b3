"""Exact-substring (span) dedup lifecycle — the Lee et al. 2022 family
end-to-end on a small planted corpus:

1. EVIDENCE — ``duplicate_spans`` localizes every maximal cross-doc
   verbatim run (word-indexed), the audit you read before cutting.
2. REMOVE — ``remove_duplicate_spans`` excises exactly those runs;
   span-free docs pass through byte-identical (whitespace and all).
3. FIXED POINT — ``remove_duplicate_spans_fp``: excision butts words
   together and can assemble NEW cross-doc runs; iterate until the
   cleaned corpus has no qualifying span at all.
4. STRUCTURAL UNITS — ``span_dedup(boundary=...)`` (paragraph mode):
   whole boilerplate paragraphs as the dedup unit, first occurrence
   kept corpus-wide, paragraph structure round-tripped on rebuild.

Each stop asserts its invariant and prints one OK line.

Run: python examples/span_dedup_job.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sarkac_spark.operators.dedup import (  # noqa: E402
    duplicate_spans,
    remove_duplicate_spans,
    remove_duplicate_spans_fp,
    span_dedup,
)
from sarkac_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("span_dedup_job")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- corpus 1: one >=12-word license block planted in two docs
    license_blk = (
        "this work is licensed under the creative commons attribution "
        "share alike four point zero international license"
    )  # 16 words
    docs = [
        (1, f"intro words here {license_blk} first body alpha"),
        (2, f"{license_blk} second body beta"),
        (3, "an untouched\tdocument with  odd   spacing"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # 1. evidence: the block is localized word-indexed in both docs
    spans = duplicate_spans(df, k=5, min_words=12).collect()
    found = {(r.doc_id, r.span_start, r.span_words) for r in spans}
    assert found == {(1, 3, 16), (2, 0, 16)}, found
    print(f"OK: evidence pass localized {len(found)} spans of the "
          "planted 16-word license block")

    # 2. removal: exactly those positions cut; doc 3 byte-identical
    cleaned = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_duplicate_spans(df, k=5, min_words=12).collect()
    }
    assert cleaned[1] == ("intro words here first body alpha", 16)
    assert cleaned[2] == ("second body beta", 16)
    assert cleaned[3] == (docs[2][1], 0)  # original bytes, odd spacing
    print("OK: removal cut 16 words from each carrier; the span-free "
          "doc passed through byte-identical")

    # 3. fixed point: cutting the shared middles makes docs 10 and 30
    #    identical — a NEW duplicate run only a second pass can see
    q1, q2 = "q1a q1b q1c q1d", "q2a q2b q2c q2d"
    mid = "m1 m2 m3 m4 m5 m6 m7"
    fp_docs = spark.createDataFrame(
        [(10, f"{q1} {mid} {q2}"), (20, f"frame {mid} tail"),
         (30, f"{q1} {q2}")],
        "doc_id long, text string",
    )
    fixed = remove_duplicate_spans_fp(fp_docs, k=3, min_words=7, max_iters=3)
    fixed_rows = {r.doc_id: (r.text_clean, r.n_removed)
                  for r in fixed.collect()}
    assert fixed_rows[10] == ("", 15) and fixed_rows[30] == ("", 8)
    re_spans = duplicate_spans(
        spark.createDataFrame(
            [(i, t) for i, (t, _) in fixed_rows.items()],
            "doc_id long, text string",
        ),
        k=3, min_words=7,
    ).count()
    assert re_spans == 0
    print("OK: fixed point reached — the cleaned corpus has zero "
          "qualifying spans (single pass provably leaves one)")

    # 4. structural units: the boilerplate PARAGRAPH is the dedup unit
    para_docs = spark.createDataFrame(
        [(1, f"page one intro\n\n{license_blk}\n\npage one body"),
         (2, f"{license_blk}\n\npage two body")],
        "doc_id long, text string",
    )
    para = {
        r.doc_id: (r.text_dedup, r.n_spans, r.n_kept)
        for r in span_dedup(
            para_docs, boundary=r"\n{2,}", joiner="\n\n"
        ).collect()
    }
    assert para[1] == (
        f"page one intro\n\n{license_blk}\n\npage one body", 3, 3
    )
    assert para[2] == ("page two body", 2, 1)
    print("OK: paragraph mode dropped the later boilerplate paragraph "
          "and round-tripped the structure of the first occurrence")

    spark.stop()


if __name__ == "__main__":
    main()

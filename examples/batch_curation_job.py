"""End-to-end batch curation job — the CI-smoked batch analogue of
streaming_demo.py: a raw JSONL "crawl" with planted corrupt lines and
planted duplicates -> declared-schema ingest with corrupt-record audit
(sources/formats.read_jsonl) -> config-driven Curator funnel -> size-
controlled parquet write (write_dataset, maxRecordsPerFile).

This is the shape of a real 100 TB ingest run: schema declared (never
inferred over the big read), broken lines audited as data instead of
failing the job, curation as one lazy Catalyst plan with a row-count
funnel, and the output written with bounded file sizes. The driver-side
JSONL synthesis below is fixture setup only — the job itself reads from
disk like production would.

Run: python examples/batch_curation_job.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sarkac_spark.curator import Curator
from sarkac_spark.session import get_spark
from sarkac_spark.sources.formats import (
    clean_records,
    corrupt_records,
    read_jsonl,
    write_dataset,
)
from sarkac_spark.sources.tables import load_table

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
N_PLANTED_DUPS = 3
PLANTED_ID_BASE = 900_000
CURATION = {
    # gopher rule gates + the distilled-classifier gate (shipped
    # weights; swap in fit_quality_lr output via a dict) — both map-only
    "quality": {"gopher": True, "classifier": True},
    "dedup": {"exact": True},
    "domain_cap": {"domain_col": "source", "cap": 60, "quality_col": "n_chars"},
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("batch_curation_job")
    work = Path(tempfile.mkdtemp(prefix="sarkac_batch_job_"))
    try:
        # --- fixture: a crawl file with known dirt ------------------------
        rows = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text", "lang", "source", "n_chars")
            .collect()
        )
        crawl = work / "crawl.jsonl"
        with open(crawl, "w") as f:
            for r in rows:
                f.write(json.dumps(r.asDict()) + "\n")
            for i, r in enumerate(rows[:N_PLANTED_DUPS]):  # exact dups, new ids
                d = r.asDict()
                d["doc_id"] = PLANTED_ID_BASE + i
                f.write(json.dumps(d) + "\n")
            f.write("{broken json here\n")  # unparseable line
            f.write('{"doc_id": "not-a-number", "text": 7}\n')  # type-broken
        n_raw = len(rows) + N_PLANTED_DUPS + 2

        # --- ingest with audit --------------------------------------------
        df = read_jsonl(spark, str(crawl), schema=SCHEMA)
        n_corrupt = corrupt_records(df).count()
        clean = clean_records(df)
        assert n_corrupt == 2, n_corrupt
        assert clean.count() == n_raw - 2
        print(f"crawl lines:   {n_raw} ({n_corrupt} corrupt, audited not dropped)")

        # --- curate: one lazy plan, funnel report --------------------------
        funnel = Curator(spark, CURATION).report(clean)
        print(f"funnel:        {funnel}")
        curated = Curator(spark, CURATION).apply(clean)

        # --- size-controlled write -----------------------------------------
        out = work / "curated"
        write_dataset(curated.repartition(2), str(out), max_records_per_file=60)
        back = spark.read.parquet(str(out))
        n_out = back.count()
        n_files = len(list(out.glob("*.parquet")))
        assert n_out == funnel["domain_cap"], (n_out, funnel)
        assert n_files >= 2  # 2 tasks, each split at the 60-row cap as needed
        kept = {r.doc_id for r in back.select("doc_id").collect()}
        # planted dups can never survive: same text ⇒ same quality verdict,
        # and exact dedup keeps the lower original id
        assert not any(PLANTED_ID_BASE + i in kept for i in range(N_PLANTED_DUPS))
        print(f"output:        {n_out} rows in {n_files} files (cap 60 rows/file)")
        print("OK: batch curation job complete")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

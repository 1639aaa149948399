"""One-shot sf10-equivalent probe of the heavy exact-join family +
facades (VERDICT r7 task 5).

The 100 TB design claim was extrapolated from 10× (sf0.1 → the
sf1-equivalent blow-up). This runs the exact-join family and the three
facades ONCE at a ×100 blow-up of sf0.1 (same join-consistent
construction as the sf1 protocol, ``scaling_curves.build_blowup
(full=True)``) and records per-query wall times so the second decade
(sf1 → sf10) can be compared against the first: a query whose
sf1→sf10 ratio exceeds 1.5× its sf0.1→sf1 ratio is flagged for a
named diagnosis.

Protocol: SOLO box, min-of-2 per query (the documented 2-4× host
noise), noop sink. Guard trips (CandidateVolumeExceeded) are recorded
as the string "guard_tripped:<bound>" — at ×100 word-salad growth
that is the governance working, not a failure.

Usage: python tools/sf10_probe.py [--factor 100] [--out BENCH_sf10_r08.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

HEAVY = [
    "q140_ppjoin_exact",
    "q143_edjoin_exact",
    "q147_ppjoin_increment",
    "q149_containment_pairs",
    "q162_jaccard_threshold_profile",
    "q163_containment_increment",
    "q165_edjoin_increment",
    "q79_cdc_chunks",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="-")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of the heavy list to "
                         "re-probe (e.g. after an environment-capacity "
                         "failure at the default heap)")
    ap.add_argument("--no-facades", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override spark.sql.shuffle.partitions for the "
                         "probe session (pair with SPARK_DRIVER_MEMORY "
                         "when diagnosing box-capacity OOMs)")
    ap.add_argument("--merge-into", default=None,
                    help="existing probe JSON: update only the re-probed "
                         "rows in it and stamp retry_conf, instead of "
                         "writing a fresh file")
    args = ap.parse_args()

    from scaling_curves import build_blowup

    import __spark_entry__ as entry_mod
    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
    )
    from batch_processing_analysis_spark.plans import registry as reg
    from batch_processing_analysis_spark.session import get_spark

    heavy = ([n for n in args.only.split(",") if n] if args.only
             else list(HEAVY))
    spark = get_spark("sf10_probe",
                      shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    big = build_blowup(spark, args.sf_dir, args.factor, full=True)
    print(f"blow-up built at {big}", file=sys.stderr)

    qs = dict(entry_mod.queries())
    qs.update(reg.EXTRA_QUERIES)

    result: dict = {"metric": "sf10_probe", "factor": args.factor,
                    "sf": 0.1 * args.factor, "queries": {},
                    "facades": {}}

    def clear_persisted() -> None:
        """Blocking-unpersist EVERY lingering block-manager entry.
        The operators localCheckpoint small staging frames and rely on
        session teardown to free them; a probe that runs the heavy
        family back-to-back at ×100 in ONE session accumulates those
        checkpoints until storage pins the heap — measured r9: after
        q143's (completed, sized) run the probe session heap-OOMed in
        q163's guard aggregate and every later row died on lost
        blocks. Each probe row now starts with an empty block
        manager — that is the isolation the per-query measurements
        claim anyway."""
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist(True)
        spark.catalog.clearCache()

    def time_once(fn) -> float:
        t0 = time.time()
        fn(spark, big).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in heavy:
        fn = qs[name]
        try:
            best = min(time_once(fn) for _ in range(2))
            result["queries"][name] = round(best, 3)
        except CandidateVolumeExceeded as e:
            bound = str(e).split("upper bound ")[1].split(" exceeds")[0]
            result["queries"][name] = f"guard_tripped:{bound}"
        except Exception as e:  # record, keep probing
            result["queries"][name] = f"error:{type(e).__name__}"
            print(f"{name}: {e}", file=sys.stderr)
        finally:
            clear_persisted()
        print(f"{name}: {result['queries'][name]}", file=sys.stderr)

    # facades on the blown-up dir (analyze_batches over the x100
    # events history; prepare_corpus over the x100 documents; the
    # 4-delta durable ingest of the x100 documents table)
    try:
        if args.no_facades:
            raise StopIteration("facades skipped (--no-facades)")
        from pyspark.sql import functions as F

        from batch_processing_analysis_spark.pipeline import (
            analyze_batches,
            prepare_corpus,
            release_analysis,
        )
        from batch_processing_analysis_spark.sources.event_log import (
            events_as_event_log,
        )
        from batch_processing_analysis_spark.sources.tables import load_table

        def run_facade(label, fn):
            def once() -> float:
                t0 = time.time()
                out = fn()
                out.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                release_analysis(out)
                return dt
            try:
                result["facades"][label] = round(min(once(), once()), 3)
            except Exception as e:
                result["facades"][label] = f"error:{type(e).__name__}"
                print(f"{label}: {e}", file=sys.stderr)
            finally:
                clear_persisted()
            print(f"{label}: {result['facades'][label]}", file=sys.stderr)

        run_facade("analyze_batches_events",
                   lambda: analyze_batches(events_as_event_log(spark, big)))
        docs_big = load_table(spark, big, "documents").select(
            "doc_id", "text", "lang")
        run_facade("prepare_corpus_docs", lambda: prepare_corpus(docs_big))

        import shutil
        import tempfile

        from batch_processing_analysis_spark.streaming.incremental_ingest import (  # noqa: E501
            read_ingested,
            start_incremental_ingest,
        )

        docs_src = (
            load_table(spark, big, "documents")
            .select("doc_id", "text",
                    F.timestamp_micros(F.col("doc_id") * 1_000_000)
                    .alias("ingest_time"))
            .localCheckpoint(eager=True)
        )
        schema = "doc_id long, text string, ingest_time timestamp"

        def ingest_once() -> float:
            root = tempfile.mkdtemp(prefix="sf10_ingest_")
            t0 = time.time()
            try:
                src = f"{root}/src"
                paths = {
                    "corpus_path": f"{root}/corpus",
                    "registry_path": f"{root}/registry",
                    "checkpoint_path": f"{root}/ckpt",
                }
                for k in range(4):
                    docs_src.filter(F.col("doc_id") % 4 == k).coalesce(
                        4).write.mode("append").parquet(src)
                    q = start_incremental_ingest(
                        spark.readStream.schema(schema).parquet(src),
                        **paths)
                    q.awaitTermination()
                read_ingested(spark, paths["corpus_path"]).write.format(
                    "noop").mode("overwrite").save()
                return time.time() - t0
            finally:
                shutil.rmtree(root, ignore_errors=True)

        result["facades"]["incremental_ingest_4_deltas"] = round(
            min(ingest_once() for _ in range(2)), 3)
        print(f"incremental_ingest_4_deltas: "
              f"{result['facades']['incremental_ingest_4_deltas']}",
              file=sys.stderr)
    except Exception as e:
        print(f"facade stage failed: {e}", file=sys.stderr)

    if args.merge_into:
        merged = json.loads(Path(args.merge_into).read_text())
        merged["queries"].update(result["queries"])
        if result["facades"]:
            merged.setdefault("facades", {}).update(result["facades"])
        merged.setdefault("retry_conf", {})
        import os as _os
        for name in result["queries"]:
            merged["retry_conf"][name] = {
                "driver_memory": _os.environ.get("SPARK_DRIVER_MEMORY",
                                                 "16g"),
                "shuffle_partitions": args.shuffle_partitions
                or int(_os.environ.get("SPARK_GRAFT_CPUS", "32")),
            }
        Path(args.merge_into).write_text(json.dumps(merged, indent=2)
                                         + "\n")
    else:
        text = json.dumps(result, indent=2)
        if args.out == "-":
            print(text)
        else:
            Path(args.out).write_text(text + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-8 optimization measurement harness (bench.py is FROZEN for the
driver; everything exploratory lives here — guide §1).

Modes:
  --isolate [names...]   time individual headline queries with the noop sink,
                         best-of-N with per-run samples printed (guide §1.4)
  --ops                  time EVERY registry operator once at the given sf
                         (regression visibility for the 71 non-headline ops —
                         VERDICT r07 'Next round' #2)
  --explain [names...]   write .explain('formatted') for the named headline
                         queries (or all) to plans/r08/<name>_<tag>.txt
  --stages <name>        substage breakdown for minhash/winnow/sanitize

Env contract matches bench.py: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from html_sanitizer_spark.pipeline.session import get_spark

    return get_spark("bench-extra", parallelism=CPUS, shuffle_partitions=CPUS)


def _headline_df(spark, name, sf_dir):
    """Build the same DataFrame bench.py times for a headline name."""
    from bench import _SANITIZE_VARIANTS, _sanitize_workload

    from html_sanitizer_spark.queries import spark_queries

    if name in _SANITIZE_VARIANTS:
        return _sanitize_workload(spark, sf_dir, **_SANITIZE_VARIANTS[name])
    return spark_queries()[name](spark, sf_dir)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_isolate(names, repeats=3):
    from bench import _HEADLINE

    spark = _spark()
    names = names or _HEADLINE
    # warm the JVM + python workers once
    _noop(_headline_df(spark, "sanitize_docs_exploded", SF_DIR))
    out = {}
    for name in names:
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            df = _headline_df(spark, name, SF_DIR)
            t0 = time.perf_counter()
            _noop(df)
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "isolate": out}))


def run_ops(repeats=1):
    from html_sanitizer_spark.queries import spark_queries

    spark = _spark()
    qmap = spark_queries()
    _noop(_headline_df(spark, "sanitize_docs_exploded", SF_DIR))  # warm-up
    out = {}
    for name, fn in qmap.items():
        samples = []
        try:
            for _ in range(repeats):
                spark.sparkContext.setJobDescription(f"op:{name}")
                t0 = time.perf_counter()
                _noop(fn(spark, SF_DIR))
                samples.append(round(time.perf_counter() - t0, 3))
            out[name] = min(samples)
        except Exception as exc:  # keep the sweep going; fail loud in output
            out[name] = f"ERROR: {exc}"
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    total = sum(v for v in out.values() if isinstance(v, float))
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "total": round(total, 3),
                      "ops": out}))


def run_explain(names, tag):
    from bench import _HEADLINE

    spark = _spark()
    names = names or _HEADLINE
    os.makedirs("plans/r08", exist_ok=True)
    import contextlib
    import io

    for name in names:
        df = _headline_df(spark, name, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r08/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


def run_stages(which):
    """Substage timing for the expensive map-side chains."""
    from pyspark.sql import functions as F

    from html_sanitizer_spark import queries as Q

    spark = _spark()
    sf = SF_DIR
    _noop(_headline_df(spark, "dedup_minhash_pairs", sf))  # warm
    t = {}

    def leg(label, df):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            _noop(df)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        t[label] = round(best, 3)
        print(label, t[label], flush=True)

    if which == "minhash":
        d = Q._spread(spark, Q._docs(spark, sf).filter(F.length("text") >= 3))
        leg("0_scan_spread", d)
        hashed = d.select(
            "doc_id",
            F.expr("transform(sequence(1, greatest(length(text)-2, 1)),"
                   " i -> md5(substring(text, i, 3)))").alias("hs"))
        leg("1_hashed", hashed)
        sigs = hashed.select(
            "doc_id",
            *[F.array_min(F.expr(f"transform(hs, h -> substring(h, {3*j+1}, 8))")).alias(f"sig{j}")
              for j in range(8)])
        leg("2_sigs", sigs)
        bands = Q.q_dedup_minhash(spark, sf)
        leg("3_bands", bands)
        stacked = bands.selectExpr(
            "doc_id",
            "stack(4, 0, band0, 1, band1, 2, band2, 3, band3) AS (band_idx, band_key)")
        buckets = (stacked.groupBy("band_idx", "band_key")
                   .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
                   .filter((F.size("docs") >= 2) & (F.size("docs") <= 100)))
        leg("4_buckets", buckets)
        leg("5_pairs_count", Q.q_dedup_minhash_pairs(spark, sf))
    elif which == "winnow":
        d = Q._spread(spark, Q._docs(spark, sf).filter(F.length("text") >= 5))
        leg("0_scan_spread", d)
        grams = d.select(
            "doc_id",
            F.expr("transform(sequence(1, greatest(length(text)-4, 1)),"
                   " i -> md5(substring(text, i, 5)))").alias("hs"))
        leg("1_grams", grams)
        fps = grams.select(
            "doc_id",
            F.expr("transform(hs, (h, i) ->"
                   " array_min(slice(hs, greatest(i - 3, 1), least(i + 1, 5))))").alias("fps"))
        leg("2_fps", fps)
        leg("3_full", Q.q_winnow_fingerprint(spark, sf))
    spark.stop()
    print(json.dumps({"sf": sf, "stages": t}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["isolate", "ops", "explain", "stages"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    if args.mode == "isolate":
        run_isolate(args.names, args.repeats)
    elif args.mode == "ops":
        run_ops()
    elif args.mode == "explain":
        run_explain(args.names, args.tag)
    elif args.mode == "stages":
        run_stages(args.names[0] if args.names else "minhash")

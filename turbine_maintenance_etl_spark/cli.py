"""Config-driven CLI mirroring the reference's orchestration surface
(scripts/prefect_workflow.py:29-35 etl → dbt-transform → train → score;
the dbt step is subsumed by the unified feature engine).

Usage:
    python -m turbine_maintenance_etl_spark.cli etl --config etl.yaml
    python -m turbine_maintenance_etl_spark.cli train --config etl.yaml \
        --model gbt --predictions-out ./out/ml_predictions
    python -m turbine_maintenance_etl_spark.cli bench
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="turbine-etl-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_etl = sub.add_parser("etl", help="run the CMAPSS feature ETL")
    p_etl.add_argument("--config", required=True)

    p_train = sub.add_parser("train", help="ETL (in-memory) + train + score")
    p_train.add_argument("--config", required=True)
    p_train.add_argument(
        "--model",
        default="linear_regression",
        help="linear_regression | random_forest | gbt | mlp (numpy 4th-model analog)",
    )
    p_train.add_argument("--predictions-out", default=None)

    sub.add_parser("bench", help="run the benchmark suite")

    p_cur = sub.add_parser(
        "curate",
        help="LLM corpus curation: quality gate -> dedup -> chunk -> pack",
    )
    p_cur.add_argument("--input", required=True, help="documents parquet path")
    p_cur.add_argument("--output", required=True, help="curated output dir")
    p_cur.add_argument("--chunk-tokens", type=int, default=64)
    p_cur.add_argument("--overlap", type=int, default=8)
    p_cur.add_argument("--max-seq-tokens", type=int, default=256)
    p_cur.add_argument("--shard-col", default="source")
    p_cur.add_argument(
        "--lm-gate",
        action="store_true",
        help="add the LM-perplexity gate (curation v2): train a bigram "
        "LM on the quality-kept docs and drop the most-perplexed tail",
    )
    p_cur.add_argument(
        "--ppl-keep-frac",
        type=float,
        default=None,
        help="fraction of least-perplexed docs the LM gate keeps "
        "(default 0.9; requires --lm-gate or --v3)",
    )
    p_cur.add_argument(
        "--v3",
        action="store_true",
        help="run the v3 capstone chain: sb3 trigram LM gate -> "
        "normalized exact dedup -> substring-span REWRITE -> chunk",
    )
    p_cur.add_argument(
        "--decontaminate",
        default=None,
        metavar="BENCHMARK_PARQUET",
        help="drop documents that fuzzy-match (MinHash-LSH + Jaccard) "
        "any document in this benchmark/eval parquet before curation",
    )
    p_cur.add_argument(
        "--decon-threshold",
        type=float,
        default=0.2,
        help="Jaccard threshold for --decontaminate (default 0.2)",
    )
    p_cur.add_argument(
        "--split-eval-pct",
        type=int,
        default=None,
        metavar="PCT",
        help="tag every output chunk train/eval with a LEAKAGE-PROOF "
        "cluster-aware split (near-duplicate docs never straddle the "
        "boundary); PCT = eval share, e.g. 20",
    )

    p_tbl = sub.add_parser(
        "table",
        help="transactional table maintenance (io/acid.py): "
        "history | compact | vacuum | changes",
    )
    p_tbl.add_argument(
        "action",
        choices=["history", "compact", "vacuum", "changes", "sweep", "rollup", "restore"],
    )
    p_tbl.add_argument("--path", required=True, help="acid table root")
    p_tbl.add_argument("--target", type=int, default=8, help="compact: target partitions")
    p_tbl.add_argument(
        "--cluster-cols",
        default=None,
        help="compact: comma-separated columns for clustered (z-order) compaction",
    )
    p_tbl.add_argument("--keep-last", type=int, default=2, help="vacuum: versions kept")
    p_tbl.add_argument("--from-version", type=int, default=None, help="changes: from")
    p_tbl.add_argument("--to-version", type=int, default=None, help="changes: to (default latest)")
    p_tbl.add_argument("--out", default=None, help="changes: write the feed here as parquet")
    p_tbl.add_argument(
        "--min-age-s",
        type=float,
        default=3600.0,
        help="sweep: only reclaim orphan data dirs older than this (safety "
        "fence against in-flight commits)",
    )
    p_tbl.add_argument("--state", default=None, help="rollup: aggregate state dir")
    p_tbl.add_argument("--keys", default=None, help="rollup: comma-separated group keys")
    p_tbl.add_argument(
        "--on-delete-minmax",
        default="error",
        choices=["error", "recompute"],
        help="rollup: policy when a change window contains deletes and "
        "aggs include min/max (recompute = splice fresh per-group "
        "min/max from the snapshot)",
    )
    p_tbl.add_argument(
        "--aggs",
        default=None,
        help="rollup: comma-separated out=fn:col specs, fn in "
        "{count,sum,min,max,approx_distinct} (approx_distinct keeps a "
        "mergeable HLL sketch; read it with hll_sketch_estimate) "
        "(e.g. n=count:id,total=sum:v,users=approx_distinct:uid)",
    )

    args = ap.parse_args(argv)

    if (
        args.cmd == "curate"
        and args.ppl_keep_frac is not None
        and not (args.lm_gate or args.v3)
    ):
        ap.error("--ppl-keep-frac requires --lm-gate or --v3 (it would be silently ignored)")

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from turbine_maintenance_etl_spark import get_spark

    spark = get_spark(app_name=f"turbine-etl-{args.cmd}")

    if args.cmd == "table":
        from turbine_maintenance_etl_spark.io import acid

        if args.action == "history":
            print(
                json.dumps(
                    [
                        {
                            "version": s.version,
                            "operation": s.operation,
                            "dirs": len(s.dirs),
                            "committed_at": s.committed_at,
                        }
                        for s in acid.history(args.path)
                    ]
                )
            )
        elif args.action == "compact":
            cols = tuple(args.cluster_cols.split(",")) if args.cluster_cols else ()
            v = acid.compact_table(spark, args.path, args.target, cluster_cols=cols)
            print(json.dumps({"compacted_version": v, "cluster_cols": list(cols)}))
        elif args.action == "vacuum":
            removed = acid.vacuum(args.path, keep_last=args.keep_last)
            print(json.dumps({"removed_dirs": removed}))
        elif args.action == "changes":
            if args.from_version is None:
                ap.error("changes requires --from-version")
            feed = acid.table_changes(
                spark, args.path, args.from_version, args.to_version
            )
            out = {"from": args.from_version, "to": args.to_version or acid.latest_version(args.path)}
            if args.out:
                feed.write.mode("overwrite").parquet(args.out)
                feed = spark.read.parquet(args.out)
                out["path"] = args.out
            counts = {
                r["_change_type"]: r["count"]
                for r in feed.groupBy("_change_type").count().collect()
            }
            out["inserts"] = counts.get("insert", 0)
            out["deletes"] = counts.get("delete", 0)
            print(json.dumps(out))
        elif args.action == "restore":
            if args.to_version is None:
                ap.error("restore requires --to-version")
            v = acid.restore_table(spark, args.path, args.to_version)
            print(json.dumps({"restored_to": args.to_version, "new_version": v}))
        elif args.action == "sweep":
            removed = acid.orphan_sweep(args.path, min_age_s=args.min_age_s)
            print(json.dumps({"removed_orphans": removed}))
        elif args.action == "rollup":
            if not (args.state and args.keys and args.aggs):
                ap.error("rollup requires --state, --keys and --aggs")
            from turbine_maintenance_etl_spark.ops.incremental import (
                refresh_agg_from_cdf,
            )

            aggs = {}
            for spec in args.aggs.split(","):
                out_col, fncol = spec.split("=")
                fn, col = fncol.split(":")
                aggs[out_col] = (fn, col)
            state = refresh_agg_from_cdf(
                spark, args.path, args.state, args.keys.split(","), aggs,
                on_delete_minmax=args.on_delete_minmax,
            )
            n = state.count() if state is not None else 0
            print(
                json.dumps(
                    {
                        "state_path": args.state,
                        "groups": n,
                        "table_version": acid.latest_version(args.path),
                    }
                )
            )
        return 0

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from turbine_maintenance_etl_spark.llm.curation import (
            curate_corpus,
            curate_corpus_v2,
            curate_corpus_v3,
        )
        from turbine_maintenance_etl_spark.llm.pack import pack_sequences

        docs = spark.read.parquet(args.input)
        n_raw = docs.count()
        if args.decontaminate:
            from turbine_maintenance_etl_spark.llm.quality import decontaminate
            from turbine_maintenance_etl_spark.ops.materialize import barrier

            bench_docs = spark.read.parquet(args.decontaminate)
            docs = decontaminate(
                docs, bench_docs, threshold=args.decon_threshold
            )
            # materialize ONCE: the MinHash-LSH decon lineage feeds the
            # curate chain, the shard join, the split assignment, AND
            # the summary count — un-barriered it re-executed per
            # consumer (r10 review)
            docs = barrier(docs, "cli-decontaminated")
        if args.v3:
            chunks = curate_corpus_v3(
                docs,
                ppl_keep_frac=(
                    0.9 if args.ppl_keep_frac is None else args.ppl_keep_frac
                ),
                chunk_tokens=args.chunk_tokens,
                overlap=args.overlap,
            )
        elif args.lm_gate:
            chunks = curate_corpus_v2(
                docs,
                ppl_keep_frac=(
                    0.9 if args.ppl_keep_frac is None else args.ppl_keep_frac
                ),
                chunk_tokens=args.chunk_tokens,
                overlap=args.overlap,
            )
        else:
            chunks = curate_corpus(
                docs, chunk_tokens=args.chunk_tokens, overlap=args.overlap
            )
        if args.shard_col in docs.columns:
            chunks = chunks.join(
                docs.select("doc_id", F.col(args.shard_col).alias("shard")), "doc_id"
            )
        else:
            chunks = chunks.withColumn("shard", F.lit("all"))
        # split BEFORE packing (r10 review): packed/ is the train-ready
        # artifact, so eval-cluster chunks packed into the same
        # sequences as train chunks — with no split column to filter on
        # — leaked the eval set into training. Packing groups on
        # (shard, split) and the packed output carries `split`.
        if args.split_eval_pct is not None:
            from turbine_maintenance_etl_spark.llm.dedup import cluster_aware_split

            splits = cluster_aware_split(
                docs, train_pct=100 - args.split_eval_pct
            ).select("doc_id", "split")
            chunks = chunks.join(splits, "doc_id")
            pack_src = chunks.select(
                F.concat_ws("\x1f", "shard", "split").alias("shard"),
                "doc_id", "chunk_id",
                F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
            )
        else:
            pack_src = chunks.select(
                "shard", "doc_id", "chunk_id",
                F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
            )
        packed = pack_sequences(pack_src, max_tokens=args.max_seq_tokens)
        if args.split_eval_pct is not None:
            packed = packed.withColumn(
                "split", F.split_part(F.col("shard"), F.lit("\x1f"), F.lit(2))
            ).withColumn(
                "shard", F.split_part(F.col("shard"), F.lit("\x1f"), F.lit(1))
            )
        out_chunks = f"{args.output}/chunks"
        out_packed = f"{args.output}/packed"
        chunks.write.mode("overwrite").parquet(out_chunks)
        packed.write.mode("overwrite").parquet(out_packed)
        written_chunks = spark.read.parquet(out_chunks)
        n_chunks = written_chunks.count()
        # counts from the WRITTEN parquet — the chunk+split plan already
        # executed once for the write; don't run it a second time
        split_counts = (
            {
                r["split"]: r["count"]
                for r in written_chunks.groupBy("split").count().collect()
            }
            if args.split_eval_pct is not None
            else None
        )
        seqs = spark.read.parquet(out_packed).groupBy("shard", "seq_no").count()
        print(
            json.dumps(
                {
                    "input_docs": n_raw,
                    "decontaminated_docs": (
                        docs.count() if args.decontaminate else None
                    ),
                    "curated_chunks": n_chunks,
                    "packed_sequences": seqs.count(),
                    "chunks_path": out_chunks,
                    "packed_path": out_packed,
                    "split_chunks": split_counts,
                }
            )
        )
        return 0

    from turbine_maintenance_etl_spark.pipeline import EtlConfig, run_etl

    cfg = EtlConfig.from_yaml(args.config)

    if args.cmd == "etl":
        res = run_etl(spark, cfg, write=True)
        print(json.dumps({"kept_sensors": res.kept_sensors, "paths": res.paths}))
        return 0

    if args.cmd == "train":
        from pyspark.sql import functions as F

        from turbine_maintenance_etl_spark.ml.pipeline import (
            feature_columns,
            predictions_table,
            train_and_score,
        )
        from turbine_maintenance_etl_spark.pipeline import prepare_test_features

        res = run_etl(spark, cfg, write=False)
        test = None
        if any(d.test for d in cfg.datasets):
            test = prepare_test_features(spark, cfg, res.kept_sensors, cfg.windows)
            if "rul_true" in test.columns:
                test = test.withColumnRenamed("rul_true", "rul")
        if args.model == "mlp":
            # 4th-model analog (numpy MLP, ml/mlp.py) — same split/metrics
            # and the same test-set contract as the MLlib paths
            from turbine_maintenance_etl_spark.ml.mlp import train_and_score_mlp

            model, scored, metrics = train_and_score_mlp(res.features, test)
        else:
            model, scored, metrics = train_and_score(res.features, test, args.model)
        out = {"model": args.model, "metrics": {k: round(v, 4) for k, v in metrics.items()}}
        if args.predictions_out:
            table = predictions_table(scored, args.model, feature_columns(res.features))
            table.write.mode("append").partitionBy("dataset").parquet(args.predictions_out)
            out["predictions_path"] = args.predictions_out
        print(json.dumps(out))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())

"""Cluster entry point for the triple factory.

Ship with:

  python scripts/make_pyfiles.py                       # builds dist/engine.zip
  spark-submit --master <cluster> \
      --py-files dist/engine.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.execution.arrow.pyspark.enabled=true \
      scripts/submit_pipeline.py \
      --pages <iceberg-or-parquet-uri> --mesh <mesh-tsv-uri> \
      --out <triples-uri> --checkpoint <lineage-uri> [--buckets 512]

On a cluster the SparkSession master/executors come from spark-submit;
this script only declares the plan.  Resume is automatic: buckets whose
lineage rows exist are skipped (streaming/incremental.py).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages table URI (parquet/iceberg)")
    ap.add_argument(
        "--pages-format", choices=["parquet", "iceberg"], default="parquet",
        help="explicit source format (a URI heuristic would misroute "
             "s3a://gs://abfss:// schemes or dotted relative paths)",
    )
    ap.add_argument("--mesh", required=True, help="MeSH tree TSV URI")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--buckets", type=int, default=512)
    ap.add_argument(
        "--mesh-type-col", default=None,
        help="mesh column holding Chemical/Disease types (fixture tables "
             "use 'type'; omit for the real 2017 MeSH tree, whose types "
             "derive from the D*/C* tree branch)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("cdr-triple-factory").getOrCreate()

    from relation_extraction_cdr_spark.sources.mesh import read_mesh_tree
    from relation_extraction_cdr_spark.streaming.incremental import run_resumable

    pages = (
        spark.read.format("iceberg").load(args.pages)
        if args.pages_format == "iceberg"
        else spark.read.parquet(args.pages)
    )
    mesh = read_mesh_tree(spark, args.mesh)
    scored = run_resumable(
        spark, pages, mesh, args.out, args.checkpoint,
        run_id=args.run_id, n_buckets=args.buckets,
        mesh_type_col=args.mesh_type_col,
    )
    from relation_extraction_cdr_spark.plans.pipeline import adjacency, materialize_triples

    triples = materialize_triples(scored)
    triples.write.mode("overwrite").parquet(args.out + "_triples")
    adjacency(triples).write.mode("overwrite").parquet(args.out + "_adjacency")


if __name__ == "__main__":
    main()

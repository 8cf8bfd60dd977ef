"""Ray-job-submittable index build driver.

Submit with:
    ray job submit --working-dir /root/repo -- \
        python scripts/build_job.py --input /data/pages --location /data/index \
        --database web --table pages --key url --version warc_ts \
        --extract html:text --doc-parts 256 --term-parts 256

Owns its Ray session (standalone script); resumable — re-submitting after a failure
skips completed partitions via the per-partition lineage entries.
"""

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Build an index generation")
    ap.add_argument("--input", required=True, help="parquet file/dir (or JSONL dir with --jsonl)")
    ap.add_argument("--location", required=True, help="index storage root")
    ap.add_argument("--database", default="db")
    ap.add_argument("--table", default="pages")
    ap.add_argument("--schema", default=(
        "st(field(url,string),field(warc_ts,date,sort),field(html,binary,no_index),"
        "field(text,string,analyze),field(lang,string))"))
    ap.add_argument("--key", default="url")
    ap.add_argument("--version", default=None, help="latest-wins dedup column")
    ap.add_argument("--extract", default=None, help="src:dst html extraction columns")
    ap.add_argument("--doc-parts", type=int, default=16)
    ap.add_argument("--term-parts", type=int, default=16)
    ap.add_argument("--jsonl", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from byzer_retrieval_ray import RetrievalCluster, TableSettings

    c = RetrievalCluster(args.location)
    try:
        c.manifest(args.database, args.table)
    except KeyError:
        c.create_table(TableSettings(args.database, args.table, args.schema, args.location))

    extract = tuple(args.extract.split(":")) if args.extract else None
    if args.jsonl:
        import ray.data
        source = ray.data.read_json(args.input)
    else:
        source = args.input
    info = c.build_from_parquet(args.database, args.table, source,
                                key_field=args.key, version_field=args.version,
                                extract=extract, num_doc_parts=args.doc_parts,
                                num_term_parts=args.term_parts)
    print(json.dumps(info["metrics"]))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Deployment smoke job — run via spark-submit --py-files:

    cd /root/repo && python -c "
    import shutil; shutil.make_archive('/tmp/ccs', 'zip', '.', 'crawler_core_spark')"
    /opt/spark/bin/spark-submit --master local[4] \
        --py-files /tmp/ccs.zip scripts/submit_job.py

The package must import FROM THE ZIP (this file deliberately does not
add the repo root to sys.path): executors unpack the archive exactly as
a real cluster would, which is the north-rule deployment contract.
Prints one marker line `SUBMIT_OK <results> <order_match>` on success.
"""

import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.appName("ccs-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from crawler_core_spark import oracle, synth
    from crawler_core_spark.plans.crawl import CrawlEngine
    from crawler_core_spark.sources.denylist import load_denylist
    from crawler_core_spark.sources.dns import dns_table
    from crawler_core_spark.sources.targets import target_file_df
    from crawler_core_spark.storage import TableStore

    n = 40
    store = TableStore(spark, tempfile.mkdtemp(prefix="submit-smoke-"))
    eng = CrawlEngine(spark, store, synth.images_df(spark, n))
    eng.publish(
        target_file_df(spark, lines=synth.seed_lines(n)),
        dns_table(spark, synth.dns_mappings(n)),
        load_denylist(spark, lines=synth.DENYLIST_LINES),
        spark.createDataFrame(synth.robots_rules(n), synth.ROBOTS_SCHEMA),
        "bs-submit",
    )
    eng.run()
    results = store.read("results")
    n_results = results.count()

    run = oracle.crawl_oracle(
        oracle.publish_oracle(
            synth.seed_lines(n), synth.dns_mappings(n),
            synth.DENYLIST_LINES, synth.robots_rules(n),
        ),
        {r["image_id"]: {"bytes": bytes(r["bytes"])} for r in
         synth.images_df(spark, n).select("image_id", "bytes").collect()},
    )
    want = [(j.seq, j.crawl_pos) for j in run.crawl_order]
    got = [
        (r["seq"], r["crawl_pos"])
        for r in results.filter(results.crawl_pos.isNotNull())
        .select("seq", "crawl_pos").orderBy("crawl_pos").collect()
    ]
    ok = got == sorted(want, key=lambda x: x[1])
    print(f"SUBMIT_OK {n_results} {ok}")
    spark.stop()
    if not ok:
        sys.exit(2)


if __name__ == "__main__":
    main()

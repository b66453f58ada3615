"""Verify drive: publish + crawl loop vs the pure-Python oracle."""
from crawler_core_spark.session import get_spark
from crawler_core_spark import synth
from crawler_core_spark.sources.targets import target_file_df
from crawler_core_spark.sources.dns import dns_table
from crawler_core_spark.sources.denylist import load_denylist
from crawler_core_spark.storage import TableStore
from crawler_core_spark.plans.crawl import CrawlEngine
import tempfile

spark = get_spark(master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
n = 50
store = TableStore(spark, tempfile.mkdtemp())
images = synth.images_df(spark, n)
eng = CrawlEngine(spark, store, images)
eng.publish(target_file_df(spark, lines=synth.seed_lines(n)),
            dns_table(spark, synth.dns_mappings(n)),
            load_denylist(spark, lines=synth.DENYLIST_LINES),
            spark.createDataFrame(synth.robots_rules(n), synth.ROBOTS_SCHEMA),
            "bs-1")
stats = eng.run(verbose=True)
store.read("results").groupBy("status").count().show()

from crawler_core_spark import oracle
run = oracle.publish_oracle(synth.seed_lines(n), synth.dns_mappings(n),
                            synth.DENYLIST_LINES, synth.robots_rules(n))
crawl = oracle.crawl_oracle(
    run, {r["image_id"]: {"bytes": r["bytes"]} for r in images.collect()})
want = sorted((j.seq, j.crawl_pos) for j in crawl.crawl_order)
got = sorted((r["seq"], r["crawl_pos"])
             for r in store.read("results").collect()
             if r["crawl_pos"] is not None)
print("crawl order match:", got == want, len(got), "rows")
assert got == want
print("VERIFY OK")

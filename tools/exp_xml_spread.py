"""A/B: xml_funcs with vs without spread() below the scan (round 15).

orders.parquet at sf0.1 is one ~2.6 MB input split -> one scan task, so
the per-row XML work (3 XPath DOM parses + 1 from_xml per row) runs on a
single core. spread() (round-robin repartition to defaultParallelism) is
the registry's documented fix for compute-bound per-row operators over
single-split local inputs. Variants run INTERLEAVED in one session;
results asserted identical (sorted collect); wall + JVM CPU seconds
recorded per run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.registry import load, spread
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = "/root/testdata/sf0.1"

spark = get_spark(app_name="xml-ab", master="local[32]", shuffle_partitions=32)


def build(with_spread: bool):
    o = load(spark, SF, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    xml = F.concat(
        F.lit("<o><st>"), F.col("o_orderstatus"),
        F.lit("</st><pri>"), F.col("o_orderpriority"),
        F.lit("</pri><c>"), cents.cast("string"), F.lit("</c></o>"),
    )
    x = o.select("o_orderkey", xml.alias("xml"))
    if with_spread:
        x = spread(x)
    parsed = F.from_xml(F.col("xml"), "st STRING, pri STRING, c BIGINT")
    return x.select(
        "o_orderkey",
        F.xpath_string(F.col("xml"), F.lit("/o/st")).alias("st"),
        F.xpath_string(F.col("xml"), F.lit("/o/pri")).alias("pri"),
        F.expr("xpath_long(xml, '/o/c')").alias("price_c100"),
        parsed["pri"].alias("pri_struct"),
    )


from _bench_util import jvm_cpu  # noqa: E402


# warmup + identity check
a = build(False).orderBy("o_orderkey").collect()
b = build(True).orderBy("o_orderkey").collect()
assert a == b, "variants differ!"
print("identity OK over", len(a), "rows", flush=True)

for rnd in range(4):
    for name, ws in (("plain", False), ("spread", True)):
        t0, c0 = time.perf_counter(), jvm_cpu()
        build(ws).write.format("noop").mode("overwrite").save()
        print(
            f"round {rnd} {name:6s} wall {time.perf_counter() - t0:7.3f}"
            f"  cpu {jvm_cpu() - c0:7.3f}",
            flush=True,
        )

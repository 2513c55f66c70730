"""Component isolation for token_fertility at a given sf (guide §1.4:
noop sink so we time computation, not the collect).

Usage: python tools/isolate_fertility.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402
from etl_excel_to_hyper_tableau_spark.operators import text as tx  # noqa: E402
from etl_excel_to_hyper_tableau_spark.operators.parallelism import spread  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

ALNUM = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
         "abcdefghijklmnopqrstuvwxyz0123456789")
WS = " \t\n\x0b\f\r"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {' '.join(f'{t:.3f}' for t in ts)}  (min {min(ts):.3f}s)")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="isolate_fertility")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = entry._t(spark, sf_dir, "documents")
    docs.count()

    sc = spark.sparkContext

    sc.setJobDescription("full entry (toPandas, as benched)")
    timed("full entry q_token_fertility", lambda: entry.queries()["token_fertility"](spark, sf_dir).toPandas())

    sc.setJobDescription("operator noop")
    timed("operator token_fertility -> noop", lambda: noop(tx.token_fertility(docs, "text", "lang")))

    sc.setJobDescription("spread only")
    timed("spread(docs).select(lang,text) -> noop", lambda: noop(spread(docs).select("lang", "text")))

    sc.setJobDescription("scan only")
    timed("docs.select(lang,text) -> noop", lambda: noop(docs.select("lang", "text")))

    # current projection, with and without spread
    def proj_current(src):
        return src.select(
            F.col("lang"),
            tx.token_count(F.col("text")).cast("long").alias("w"),
            tx.word_token_count(F.col("text")).alias("sw"),
            F.length(F.col("text")).cast("long").alias("ch"))

    sc.setJobDescription("current projection after spread")
    timed("spread + current projection -> noop", lambda: noop(proj_current(spread(docs))))
    sc.setJobDescription("current projection no spread")
    timed("no-spread current projection -> noop", lambda: noop(proj_current(docs)))

    # component expressions, each isolated (after spread)
    comps = {
        "w: size(filter(split(trim)))": tx.token_count(F.col("text")).cast("long"),
        "w alt: regexp_count(\\S+)": F.regexp_count(F.col("text"), F.lit(r"\S+")).cast("long"),
        "w alt2: size(split(trim)) no HOF": F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(F.col("text")), r"\s+"))).cast("long"),
        "sw: 2x regexp_replace": tx.word_token_count(F.col("text")),
        "sw alt: translate": (F.ceil((F.length(F.col("text"))
                                      - F.length(F.translate(F.col("text"), ALNUM, ""))) / F.lit(4.0))
                              + F.length(F.translate(F.col("text"), ALNUM + WS, ""))).cast("long"),
        "ch: length": F.length(F.col("text")).cast("long"),
    }
    for label, col in comps.items():
        sc.setJobDescription(label)
        timed(label, lambda c=col: noop(spread(docs).select(F.col("lang"), c.alias("x"))))

    spark.stop()


if __name__ == "__main__":
    main()

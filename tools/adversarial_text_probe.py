"""Adversarial-text probe: replace the documents table with pathological
content — empty strings, whitespace-only docs, a 1 MB single-line doc, a
100k-line doc, giant single tokens, unicode/CJK/emoji, repeated
boilerplate — and run every documents-consuming registry query.  Text
operators are regex/explode-heavy; this is where unbounded per-row
expansion or driver-side string handling dies first.  Pass = sane result
or loud ValueError; fail = crash (or a query that cannot finish the
per-query timeout at this tiny row count).

Usage: python tools/adversarial_text_probe.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OTHER_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]

OK_ERRORS = (ValueError,)


def pathological_docs():
    docs = []
    did = 0

    def add(text, lang="en", source="adv"):
        nonlocal did
        docs.append((did, text, lang, source, len(text)))
        did += 1

    add("")                                  # empty
    add("   \t  \n   ")                      # whitespace only
    add("x" * 1_000_000)                     # 1 MB single token, single line
    add("word " * 200_000)                   # 1 MB of one repeated token
    add("line\n" * 100_000)                  # 100k identical lines
    add("\n".join(f"unique line {i}" for i in range(50_000)))  # 50k lines
    add("a")                                 # single char
    add("naïve café Zürich — ünïcödé")       # accents
    add("日本語のテキストです。中文文本。한국어 텍스트.")  # CJK
    add("🚀🔥💯 emoji 🎉🎊 everywhere 🌍🌎🌏")   # emoji
    add("tab\tseparated\tfields\there")
    add("null\x00byte")                      # embedded NUL
    add('{"json": "looking", "doc": [1,2,3]}')
    add("<html><body>markup &amp; entities</body></html>")
    add("e = mc^2; ∑ ∫ ∂ √ ≤ ≥ ≠ π")          # math symbols
    # boilerplate shared across many docs (for boilerplate_removal)
    for i in range(10):
        add(f"COPYRIGHT NOTICE\nbody text {i} differs here\nCOPYRIGHT NOTICE")
    # normal-ish docs so samplers/statistics have mass
    for i in range(30):
        add(f"regular document number {i} with some plain text content "
            f"and a few repeated repeated words", source=f"s{i % 3}")
    return docs


def main():
    os.environ.setdefault("ANOVOS_EXACT_STATS", "1")
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    src = "/root/testdata/sf0.001"
    only = set(sys.argv[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("adversarial-text-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    adv_dir = tempfile.mkdtemp(prefix="anovos_advtext_")
    for t in OTHER_TABLES:
        os.symlink(f"{src}/{t}.parquet", f"{adv_dir}/{t}.parquet")
    spark.createDataFrame(
        pathological_docs(),
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{adv_dir}/documents.parquet")

    # queries that read the documents table (inspect the source lazily:
    # run everything; non-document queries read the symlinked tables and
    # act as a no-regression control)
    from anovos_spark.queries import registry

    crashes = []
    for name, fn in registry().items():
        if only and name not in only:
            continue
        try:
            n = fn(spark, adv_dir).count()
            print(f"OK    {name}: {n} rows")
        except OK_ERRORS as e:
            print(f"LOUD  {name}: ValueError: {str(e)[:120]}")
        except Exception as e:
            crashes.append(name)
            print(f"CRASH {name}: {type(e).__name__}: {str(e)[:200]}")
        finally:
            spark.catalog.clearCache()

    checked = sum(1 for n in registry() if not only or n in only)
    print(f"\n{checked - len(crashes)}/{checked} survive adversarial text; "
          f"crashes: {crashes}")
    spark.stop()
    shutil.rmtree(adv_dir, ignore_errors=True)
    sys.exit(1 if crashes else 0)


if __name__ == "__main__":
    main()

"""crawler_spark — a PySpark-native URL-frontier + fetch scheduler.

A from-scratch reimplementation of the *capabilities* of jahaynes/crawler
(reference at /root/reference, ~1600 LoC Haskell, STM + green threads) as a
Spark-first engine: six snapshot-committed tables (frontier, url_seen,
crawled_docs, errors, metrics, runs), three vectorized pandas UDF surfaces
(canonicalize, resolve, parse), and a driver round loop where each crawl
round is one DataFrame job ending in an atomic checkpoint commit.

Not a port: no threads, no queues, no STM analogs. See SURVEY.md.
"""

__version__ = "0.1.0"

"""s_crawler_spark — a PySpark-native URL-frontier + fetch/parse engine.

A from-scratch re-expression of the capabilities of the reference crawler
(lijihui0401/s_crawler, surveyed in SURVEY.md) as distributed DataFrame
dataflow: Arrow-vectorized extraction kernels, an exact+Bloom URL-seen set,
a host-salted politeness-aware frontier, and resumable snapshot-committed
crawl waves. See plans/wave.py for the end-to-end wave job.
"""

__version__ = "0.1.0"

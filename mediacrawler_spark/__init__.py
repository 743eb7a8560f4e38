"""mediacrawler_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the query and data-processing capabilities of the reference
crawler (xPeiPeix/MediaCrawler, studied read-only at /root/reference) as an
idiomatic Spark engine:

- a partitioned, priority URL frontier with per-host politeness budgets,
  robots gating and Bloom-prefiltered exact URL-seen dedup
  (``plans.crawl``, ``operators.scheduler``, ``operators.seen``);
- vectorized Arrow extraction UDFs replicating the reference's text kernel
  byte-for-byte (``functions.text``, ``operators.extract``);
- the relational operator surface of the reference's stores/loops
  (projections, windows, budget limits, set ops) as plain DataFrame ops;
- large-scale training-data pipeline operators: dedup (exact/MinHash-LSH/
  SimHash/Jaccard), ANN similarity search, text stats, multimodal plumbing
  (``operators.dedup``, ``operators.similarity``, ``operators.textstats``).

Everything here is built on public PySpark APIs only.
"""

__version__ = "0.1.0"

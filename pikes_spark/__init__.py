"""pikes_spark — a PySpark-native knowledge-graph construction engine.

Rebuilds the extraction semantics of Pikes (BenediktHeinrichs/pikes,
FBK "PIKES — Knowledge Extraction Suite") as an idiomatic Spark
DataFrame pipeline:

    pages (url, warc_ts, html, text, lang)
      -> annotate   (tokens/terms/deps/entities/timex/predicates)   [J1]
      -> link       (broadcast candidate join + argmax)             [J2]
      -> distill    (NAFFilter + RDFGenerator rule semantics)       [J3]
      -> canonicalize (salted groupBy + connected components)       [J4]
      -> triples    (spo/pos-sorted partitioned tables + lineage)   [J5]

plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing).

Everything here derives from public knowledge: the Apache Spark API,
the reference repo under /root/reference (cited by file:line in
docstrings), and published papers.
"""

__version__ = "0.1.0"

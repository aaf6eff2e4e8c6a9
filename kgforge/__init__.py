"""kgforge — a PySpark-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of the reference
converter (orey/csv2rdf, surveyed in /root/repo/SURVEY.md) as a
declarative, columnar, Catalyst-optimized mapping engine:

    config -> MappingSpec (driver-side compile)
           -> DataFrame select(array<struct<triple>>) -> explode
           -> dropDuplicates -> partitioned write

plus the web-scale KG stages the north rule requires: HTML text
extraction, mention detection, entity linking (MinHash-LSH blocking +
cosine scoring), canonicalization (connected components with min-IRI
election), and resumable materialization with per-partition lineage.
"""

__version__ = "0.1.0"

"""graphene_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of ``ajo2995/graphene-loader``
(a single-threaded Groovy record-walker that builds a Neo4j property graph)
as an idiomatic Spark DataFrame pipeline over multi-turn conversation
transcripts:

    transcripts -> stable turn ordering -> vectorized triple extraction
    -> entity linking (broadcast + salted join, MinHash/LSH blocking)
    -> canonicalization (connected components over the alias graph)
    -> deduplicated nodes/edges/triples tables with per-partition lineage
    -> post-process graph rewrites (2-hop TO edges, reification, bridges)

Reference semantics are cited per module as ``file:line`` into
``/root/reference`` so parity can be checked; no reference code is reused.
"""

__version__ = "0.1.0"

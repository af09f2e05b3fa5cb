"""Document-collection loaders — the GrameneMongoLoader family re-expressed.

The reference walks MongoDB collections one doc at a time
(GrameneMongoLoader.groovy:23-43) through a shared ``preprocess`` and a
per-collection ``process``: ontologies (OntologyLoader.groovy:18-54), taxa
(NCBITaxonLoader), genes (GeneLoader.groovy:21-51).  Here each loader is a
pure DataFrame transform over a document-shaped table; side-emits (synonyms,
xrefs, relationships) become exploded edge-candidate frames.

Input schema for ontology docs (one row per term):
    _id long, name string, namespace string, is_obsolete boolean,
    synonym array<string>, xref array<string>,            -- "KEY:VALUE ..."
    relationship array<string>,                           -- "part_of GO:0001 ! lbl"
    property_value string, subset array<string>
Gene docs (GeneLoader.groovy:21-51):
    _id string, name string, taxon_id long, map string, region string,
    start int, end int, xrefs map<string, array<string>>

Everything stays JVM-side: regexp_extract for the relationship grammar
(OntologyLoader.groovy:16), split-on-first-colon for xrefs
(GrameneMongoLoader.groovy:89-110), initcap-style namespace labels
(GrameneMongoLoader.groovy:76-78).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .graph import adjacency_edges


def _union_nodes_first_wins(*frames: DataFrame) -> DataFrame:
    """Union node frames keeping ONE row per name with the EARLIEST frame
    winning.  Callers pass real term/entity nodes before bare Name/XRef/
    Region value nodes, so a value node whose string collides with a term
    name (homotypic synonyms are common) can never replace the term's
    labels/props — a plain dropDuplicates keeps an arbitrary,
    partition-dependent row."""
    from pyspark.sql import Window

    tagged = [df.withColumn("_prio", F.lit(i)) for i, df in enumerate(frames)]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    w = Window.partitionBy("name").orderBy("_prio")
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


# OntologyLoader.groovy:16 — predicate + namespaced id + label
_REL_RE = r"([a-z_]+) ([A-Z][A-Z0-9]{1,9}):0*(\d+) ! (.*)"
# GrameneMongoLoader.groovy:51-55
_RANK_RE = r"has_rank NCBITaxon:(\w+)"

XREF_DROP_KEYS = ["GC_ID"]
XREF_SPLIT_VALUE_KEYS = ["Reactome", "VZ", "http", "loinc"]


def _camel(col):
    """underscore_case -> CamelCase (GrameneMongoLoader.groovy:76-78)."""
    return F.regexp_replace(F.initcap(F.regexp_replace(F.lower(col), "_", " ")), " ", "")


def filter_obsolete(docs: DataFrame, flag_col: str = "is_obsolete") -> DataFrame:
    """P3 (OntologyLoader.groovy:24-27): drop rows flagged obsolete; a missing
    or null flag means live (the reference's truthiness check)."""
    return docs.filter(~F.coalesce(F.col(flag_col), F.lit(False)))


def load_ontology(docs: DataFrame, path: str) -> dict[str, DataFrame]:
    """One ontology collection -> nodes + edge candidates.

    Mirrors OntologyLoader.process: drop obsolete terms (P3), drop the long
    ``def`` field (P1), namespace + subsets become extra labels, synonyms
    become Name nodes + SYNONYM edges, xrefs become XREF edges with the
    key-specific value handling (P6), relationship strings parse into
    dynamically-typed edges (P5), has_rank extracts a rank prop (P4).

    ``path`` is the ontology prefix (GO/PO/TO/...) — the primary label and
    the term-name namespace (``GO:123``)."""
    live = filter_obsolete(docs).filter(F.col("_id").isNotNull())
    term_name = F.format_string("%s:%d", F.lit(path), F.col("_id"))

    rank = F.regexp_extract(F.coalesce(F.col("property_value"), F.lit("")), _RANK_RE, 1)
    nodes = live.select(
        term_name.alias("name"),
        F.array_sort(
            F.array_union(
                F.array(F.lit(path), F.lit("Ontology"), _camel(F.coalesce("namespace", F.lit("")))),
                F.transform(F.coalesce("subset", F.array().cast("array<string>")), _camel),
            )
        ).alias("labels"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("name"), F.lit("rank")),
                F.array(F.col("name"), F.when(rank != "", F.initcap(rank))),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("props"),
    ).withColumn("labels", F.array_distinct(F.filter("labels", lambda x: x != "")))

    synonyms = (
        live.select(term_name.alias("src_name"), F.explode(F.coalesce("synonym", F.array().cast("array<string>"))).alias("syn"))
        .filter(F.col("syn").isNotNull() & (F.col("syn") != ""))
        .select(
            "src_name",
            F.col("syn").alias("dst_name"),
            F.lit("SYNONYM").alias("rel_type"),
        )
    )
    name_nodes = synonyms.select(
        F.col("dst_name").alias("name"),
        F.array(F.lit("Name")).alias("labels"),
        F.create_map().cast("map<string,string>").alias("props"),
    ).dropDuplicates(["name"])  # distinct() unsupported on map columns

    # xrefs: "KEY:VALUE" split on first colon; GC_ID dropped; certain keys
    # keep only the pre-space part of the value (GrameneMongoLoader.groovy:89-110)
    xr = (
        live.select(term_name.alias("src_name"), F.explode(F.coalesce("xref", F.array().cast("array<string>"))).alias("x"))
        .withColumn("key", F.split("x", ":", 2).getItem(0))
        # F.get, not getItem: a colon-less xref yields a 1-element split and
        # getItem(1) THROWS under ANSI mode — the isNotNull filter below is
        # the intended null-tolerant semantics
        .withColumn("val", F.get(F.split("x", ":", 2), 1))
        .filter(~F.col("key").isin(XREF_DROP_KEYS) & F.col("val").isNotNull())
        .withColumn(
            "val",
            F.when(
                F.col("key").isin(XREF_SPLIT_VALUE_KEYS), F.split("val", " ", 2).getItem(0)
            ).otherwise(F.col("val")),
        )
        .select(
            "src_name",
            F.concat_ws(":", "key", "val").alias("dst_name"),
            F.lit("XREF").alias("rel_type"),
        )
    )
    xref_nodes = xr.select(
        F.col("dst_name").alias("name"),
        F.array(F.split("dst_name", ":", 2).getItem(0)).alias("labels"),
        F.create_map().cast("map<string,string>").alias("props"),
    ).dropDuplicates(["name"])

    # relationship strings -> dynamic predicate edges, zeros stripped
    rels = (
        live.select(term_name.alias("src_name"), F.explode(F.coalesce("relationship", F.array().cast("array<string>"))).alias("r"))
        .withColumn("pred", F.upper(F.regexp_extract("r", _REL_RE, 1)))
        .withColumn("ns", F.regexp_extract("r", _REL_RE, 2))
        # try_cast: a >19-digit ordinal would make a plain cast THROW under
        # ANSI mode; non-coercible ordinals drop like any other non-match
        .withColumn("oid", F.regexp_extract("r", _REL_RE, 3).try_cast("long"))
        .filter((F.col("pred") != "") & F.col("oid").isNotNull())
        .select(
            "src_name",
            F.format_string("%s:%d", F.col("ns"), F.col("oid")).alias("dst_name"),
            F.col("pred").alias("rel_type"),
        )
    )

    edge_candidates = synonyms.unionByName(xr).unionByName(rels).withColumn(
        "props", F.create_map().cast("map<string,string>")
    )
    return {
        "nodes": _union_nodes_first_wins(nodes, name_nodes, xref_nodes),
        "edge_candidates": edge_candidates,
    }


def load_genes(genes: DataFrame, taxon_index: DataFrame | None = None) -> dict[str, DataFrame]:
    """Gene docs -> gene nodes, SPECIES edges, location props, adjacency chains.

    Mirrors GeneLoader: empty-key/value pruning (GeneLoader.groovy:25),
    location concat ``map:region`` (GeneLoader.groovy:132), taxon FK join
    (J4, GeneLoader.groovy:119-128), per-region ordered FIRST/NEXT/LAST
    chains (W1, GeneLoader.groovy:53-69).

    ``taxon_index``: optional (taxon_id long, taxon_name string) dimension —
    broadcast-joined for SPECIES edges."""
    g = genes.filter(F.col("_id").isNotNull() & (F.col("_id") != ""))
    nodes = g.select(
        F.col("_id").alias("name"),
        F.array(F.lit("Gene")).alias("labels"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("name"), F.lit("location"), F.lit("start"), F.lit("end")),
                F.array(
                    F.col("name"),
                    F.concat_ws(":", "map", "region"),
                    F.col("start").cast("string"),
                    F.col("end").cast("string"),
                ),
            ),
            lambda k, v: v.isNotNull() & (v != ""),
        ).alias("props"),
    )

    species_edges = None
    if taxon_index is not None:
        species_edges = (
            g.join(F.broadcast(taxon_index), "taxon_id")
            .select(
                F.col("_id").alias("src_name"),
                F.col("taxon_name").alias("dst_name"),
                F.lit("SPECIES").alias("rel_type"),
                F.create_map().cast("map<string,string>").alias("props"),
            )
        )

    # adjacency per (map, region) ordered by start (W1)
    located = g.filter(F.col("region").isNotNull() & F.col("start").isNotNull()).withColumn(
        "_reg", F.concat_ws(":", "map", "region")
    )
    chains = adjacency_edges(located, "_reg", "start", "_id").withColumn(
        "props", F.create_map().cast("map<string,string>")
    )
    region_nodes = located.select(
        F.col("_reg").alias("name"),
        F.array(F.lit("Region")).alias("labels"),
        F.create_map().cast("map<string,string>").alias("props"),
    ).dropDuplicates(["name"])

    out_edges = chains if species_edges is None else species_edges.unionByName(chains)
    return {
        "nodes": _union_nodes_first_wins(nodes, region_nodes),
        "edge_candidates": out_edges,
    }


def load_taxonomy(docs: DataFrame) -> dict[str, DataFrame]:
    """Taxonomy collection -> taxon nodes + SUPER_TAXON/ALT_ID/SYNONYM edges.

    Mirrors NCBITaxonLoader.groovy:16-50:
      * labels = [Taxon, <rank>, NCBITaxonomy] (rank label comes straight
        from the doc, :19);
      * parent = the FIRST is_a entry (parentTaxonId, :41-50) ->
        SUPER_TAXON edge (:28);
      * every alt_id fans out to an ALT_ID edge (:31-35);
      * synonyms become Name nodes + SYNONYM edges (createSynonyms in
        GrameneMongoLoader).
    Parent/alt references are resolved AFTER all nodes exist via a self-join
    on _id (the reference defers them through linkToExternal and drops
    unresolved ones with a count, Loader.groovy:45-47) — unresolved rows are
    returned as ``dangling`` for the metrics table, never an error.

    docs: _id long, name string, rank string, is_a array<long>,
          alt_id array<long>, synonym array<string>
    """
    live = docs.filter(F.col("_id").isNotNull())
    nodes = live.select(
        F.col("name"),
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.array(F.lit("Taxon"), _camel(F.coalesce("rank", F.lit(""))), F.lit("NCBITaxonomy")),
                    lambda x: x != "",
                )
            )
        ).alias("labels"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("name"), F.lit("rank")),
                F.array(F.col("name"), F.col("rank")),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("props"),
    )
    ids = live.select(F.col("_id").alias("_tid"), F.col("name").alias("_tname"))

    parent_refs = live.select(
        F.col("name").alias("src_name"),
        # try_element_at: ANSI mode makes element_at throw on empty arrays
        F.try_element_at(F.coalesce("is_a", F.array().cast("array<long>")), F.lit(1)).alias("_tid"),
        F.lit("SUPER_TAXON").alias("rel_type"),
    ).filter(F.col("_tid").isNotNull())
    alt_refs = live.select(
        F.col("name").alias("src_name"),
        F.explode(F.coalesce("alt_id", F.array().cast("array<long>"))).alias("_tid"),
        F.lit("ALT_ID").alias("rel_type"),
    )
    refs = parent_refs.unionByName(alt_refs)
    # broadcast is safe here: `ids` is the taxonomy collection itself (~10^6
    # rows / ~100 MB for NCBI — the reference holds the same map in driver
    # memory, Loader.groovy:22); it does NOT scale with the transcript corpus
    resolved = refs.join(F.broadcast(ids), "_tid").select(
        "src_name", F.col("_tname").alias("dst_name"), "rel_type"
    )
    dangling = refs.join(F.broadcast(ids), "_tid", "left_anti").select(
        "src_name", F.col("_tid").cast("string").alias("dst_name"), "rel_type"
    )

    synonyms = (
        live.select(
            F.col("name").alias("src_name"),
            F.explode(F.coalesce("synonym", F.array().cast("array<string>"))).alias("syn"),
        )
        .filter(F.col("syn").isNotNull() & (F.col("syn") != ""))
        .select("src_name", F.col("syn").alias("dst_name"), F.lit("SYNONYM").alias("rel_type"))
    )
    name_nodes = synonyms.select(
        F.col("dst_name").alias("name"),
        F.array(F.lit("Name")).alias("labels"),
        F.create_map().cast("map<string,string>").alias("props"),
    ).dropDuplicates(["name"])

    return {
        "nodes": _union_nodes_first_wins(nodes, name_nodes),
        "edge_candidates": resolved.unionByName(synonyms).withColumn(
            "props", F.create_map().cast("map<string,string>")
        ),
        "dangling": dangling,
    }


def load_domains(docs: DataFrame) -> dict[str, DataFrame]:
    """Domains collection -> InterPro nodes, InterProSignature value nodes,
    CONTRIBUTES_TO edges, and the signature-type suppression set.

    Mirrors DomainLoader.groovy:18-48:
      * fixed NODE_PROP_KEYS stay on the InterPro node (labels
        [InterPro, <type>], :30);
      * every other key is a signature descriptor: each value becomes an
        InterProSignature node labelled with the descriptor key, plus a
        CONTRIBUTES_TO edge signature -> InterPro (:32-42);
      * the lowercased descriptor keys accumulate into ``signature_types``
        (:24) — the suppression set GeneLoader consumes (J11, :158-160 via
        isInterProSignature), exposed here as a 1-column DataFrame to
        broadcast into suppress_signature_features().

    docs: _id long, name string, type string,
          descriptors map<string, array<string>>
    """
    live = docs.filter(F.col("_id").isNotNull())
    interpro_nodes = live.select(
        F.col("name"),
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.array(F.lit("InterPro"), F.coalesce("type", F.lit(""))),
                    lambda x: x != "",
                )
            )
        ).alias("labels"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("name"), F.lit("type")),
                F.array(F.col("name"), F.col("type")),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("props"),
    )
    desc = (
        live.select(
            F.col("name").alias("ipr_name"),
            F.explode(F.coalesce("descriptors", F.create_map().cast("map<string,array<string>>"))).alias("dkey", "vals"),
        )
        .select("ipr_name", "dkey", F.explode("vals").alias("dname"))
        .filter(F.col("dname").isNotNull() & (F.col("dname") != ""))
    )
    sig_nodes = desc.select(
        F.col("dname").alias("name"),
        F.array_sort(F.array(F.lit("InterProSignature"), F.col("dkey"))).alias("labels"),
        F.create_map().cast("map<string,string>").alias("props"),
    ).dropDuplicates(["name"])
    edges = desc.select(
        F.col("dname").alias("src_name"),
        F.col("ipr_name").alias("dst_name"),
        F.lit("CONTRIBUTES_TO").alias("rel_type"),
        F.create_map().cast("map<string,string>").alias("props"),
    )
    signature_types = desc.select(F.lower("dkey").alias("sig_type")).distinct()
    return {
        "nodes": _union_nodes_first_wins(interpro_nodes, sig_nodes),
        "edge_candidates": edges,
        "signature_types": signature_types,
    }


def suppress_signature_features(
    features: DataFrame, signature_types: DataFrame, name_col: str = "feature_type"
) -> DataFrame:
    """J11 left-anti suppression (GeneLoader.groovy:158-160): drop protein
    features whose type is already known as an InterPro signature type."""
    sig = signature_types.select(F.col("sig_type").alias("_sig"))
    return features.join(
        F.broadcast(sig), F.lower(F.col(name_col)) == F.col("_sig"), "left_anti"
    )


def load_gene_ontology_xrefs(
    genes: DataFrame,
    evidence_col: str = "xrefs",
) -> DataFrame:
    """J5: gene ontology-evidence joins — explode the per-ontology xref map
    twice (ontology -> accessions), carrying the evidence code as an edge
    prop (GeneLoader.groovy:84-117).

    genes must carry ``xrefs map<string, array<string>>`` where the key is
    the ontology path (GO/PO/...) and values are "accession:evidence" strings.
    """
    return (
        genes.select(F.col("_id").alias("src_name"), F.explode(evidence_col).alias("onto", "accs"))
        .select("src_name", "onto", F.explode("accs").alias("acc_ev"))
        # F.get + try_cast: an evidence-less or non-numeric accession must
        # become a null/dropped row, not an ANSI-mode job failure
        .withColumn("acc", F.split("acc_ev", ":", 2).getItem(0).try_cast("long"))
        .withColumn("evidence", F.get(F.split("acc_ev", ":", 2), 1))
        .filter(F.col("acc").isNotNull())
        .select(
            "src_name",
            F.format_string("%s:%d", F.col("onto"), F.col("acc")).alias("dst_name"),
            F.upper(F.col("onto")).alias("rel_type"),
            F.map_filter(
                F.map_from_arrays(F.array(F.lit("evidence")), F.array(F.col("evidence"))),
                lambda k, v: v.isNotNull(),
            ).alias("props"),
        )
    )

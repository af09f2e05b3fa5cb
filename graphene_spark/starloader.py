"""Star-schema graph loader — the ReactomeLoader multi-pass re-expressed.

The reference walks a MySQL-dump star schema five times
(ReactomeLoader.groovy:20-43): nodes from DatabaseObject, FK edges from the
same table, decorator tables (label + props + FK edges + identifier caches),
newnode tables (value nodes + ranked edges), and pure m:m relationship
tables.  Passes 2-5 are independent given pass 1, so here they become
parallel DAG branches over the same DataFrames instead of sequential
re-scans (SURVEY.md §3.3).

Conventions mirrored exactly:

* table routing by name regex (ReactomeLoader.groovy:81-111 ``groupBy`` -> A5)
* relationship columns discovered by the ``_class`` suffix convention
  (ReactomeLoader.groovy:291-299 findRelationships)
* prop columns = remaining minus DB_ID minus underscore-containing
  (ReactomeLoader.groovy:301-315 findProps)
* camelCase -> CONSTANT_CASE relationship names (ReactomeLoader.groovy:284-287)
* m:m edges carry a ``rank`` prop from ``<rship>_rank`` (W2,
  ReactomeLoader.groovy:267-269); m:1 edges instead denormalize the target's
  name onto the source as ``<rship>Name`` (J6, ReactomeLoader.groovy:271-277)
* numeric coercion + 'NULL' sentinel skip (P9, ReactomeLoader.groovy:248-258)
* identifier caches for DatabaseIdentifier/ReferenceEntity/GO_* decorators
  (ReactomeLoader.groovy:125-159) -> an ``identifier_index`` DataFrame (the
  entity-dictionary input of cross-loader linking, J3)

Node ids: DatabaseObject DB_IDs are used verbatim (Loader.groovy:57-59);
new value nodes get deterministic negative ids (xxhash64 | sign) so the two
id spaces cannot collide.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SPECIAL = {"DatabaseObject", "DataModel", "Ontology"}
NEWNODE_PATTERNS = [
    r".*_2_name.*", r".*_2_synonym.*", r".*_2_ec.*", r".*_2_chain.*",
    r".*_2_otherIdentifier.*", r".*_2_secondCoordinate.*", r"ReferenceSequence_2_.*",
]
RELATIONSHIP_PATTERN = r".*_2_.*"


def classify_tables(names: list[str]) -> dict[str, list[str]]:
    """Route tables into special/newnodes/relationships/decorators (A5)."""
    out: dict[str, list[str]] = {"special": [], "newnodes": [], "relationships": [], "decorators": []}
    for n in names:
        if n in SPECIAL:
            out["special"].append(n)
        elif any(re.fullmatch(p, n) for p in NEWNODE_PATTERNS):
            out["newnodes"].append(n)
        elif re.fullmatch(RELATIONSHIP_PATTERN, n):
            out["relationships"].append(n)
        else:
            out["decorators"].append(n)
    return out


def find_relationships(cols: list[str]) -> list[str]:
    """Relationship columns by the `_class` suffix convention.  The node
    table's own bare ``_class`` column is the row's label, not a
    relationship (the reference hardcodes the node table's FK list instead,
    ReactomeLoader.groovy:71-73)."""
    return [c[: -len("_class")] for c in cols if c.endswith("_class") and c != "_class"]


def find_props(cols: list[str], rships: list[str] | None = None) -> list[str]:
    """Prop columns: everything except relationships, DB_ID, and any name
    containing an underscore."""
    drop = set(rships or []) | {"DB_ID"}
    return [c for c in cols if c not in drop and "_" not in c]


def camel_to_constant(s: str) -> str:
    """camelCase -> CONSTANT_CASE (driver-side, used for rel-type literals)."""
    return re.sub(r"(?<!^)(?=[A-Z])", "_", s).upper()


def _clean(col):
    """'NULL' sentinel and empty string -> null."""
    return F.when((col.isNull()) | (col == "NULL") | (col == ""), F.lit(None)).otherwise(col)


def _value_node_id(label: str, name_col):
    """Deterministic id for created value nodes, disjoint from DB_ID space
    (negative via sign-bit set)."""
    return -F.abs(F.xxhash64(F.lit(label), name_col)) - 1


def _props_map(cols: list[str]):
    """map<string,string> from prop columns, nulls/sentinels dropped
    (P2/P9 skip semantics)."""
    if not cols:
        return F.create_map().cast("map<string,string>")
    pairs = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(_clean(F.col(c)))
    return F.map_filter(F.map_from_arrays(
        F.array(*pairs[0::2]), F.array(*pairs[1::2])
    ), lambda k, v: v.isNotNull())


def build_star_graph(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Five-pass star-schema load as one DataFrame DAG.

    Input: {table_name -> DataFrame of string columns} (from
    sources.mysqldump.read_all_tables or any reader).
    Output: nodes / edges / identifier_index DataFrames.
    """
    groups = classify_tables(list(tables))
    if "DatabaseObject" not in tables:
        raise ValueError("star schema requires a DatabaseObject table")
    dbo = tables["DatabaseObject"]

    # ---- pass 1: one node per DatabaseObject row, _class as label ----------
    base_nodes = dbo.select(
        F.col("DB_ID").cast("long").alias("node_id"),
        _clean(F.col("_displayName")).alias("name"),
        F.array(F.col("_class"), F.lit("Reactome")).alias("labels"),
    ).filter(F.col("node_id").isNotNull())

    node_names = base_nodes.select("node_id", "name")

    label_adds = []       # (node_id, label)
    prop_adds = []        # (node_id, props map, seq)
    edge_parts = []       # (src, dst, rel_type, props)
    new_node_parts = []   # (node_id, name, label)
    ident_parts = []      # (label, key, node_id)

    def add_fk_edges(df: DataFrame, rships: list[str], seq: int):
        """FK edge emission shared by passes 2/3/5 (addRelationships,
        ReactomeLoader.groovy:261-282)."""
        cols = df.columns
        for rship in rships:
            rel_type = camel_to_constant(rship)
            has_rank = f"{rship}_rank" in cols
            rows = df.filter(_clean(F.col(rship)).isNotNull())
            if has_rank:
                # m:m: rank prop on the edge (W2)
                edge_parts.append(
                    rows.select(
                        F.col("DB_ID").cast("long").alias("src"),
                        F.col(rship).cast("long").alias("dst"),
                        F.lit(rel_type).alias("rel_type"),
                        F.map_filter(
                            F.map_from_arrays(
                                F.array(F.lit("rank")), F.array(_clean(F.col(f"{rship}_rank")))
                            ),
                            lambda k, v: v.isNotNull(),
                        ).alias("props"),
                    )
                )
            else:
                # m:1: plain edge + denormalized <rship>Name prop (J6)
                edge_parts.append(
                    rows.select(
                        F.col("DB_ID").cast("long").alias("src"),
                        F.col(rship).cast("long").alias("dst"),
                        F.lit(rel_type).alias("rel_type"),
                        F.create_map().cast("map<string,string>").alias("props"),
                    )
                )
                denorm = (
                    rows.select(
                        F.col("DB_ID").cast("long").alias("node_id"),
                        F.col(rship).cast("long").alias("_target"),
                    )
                    .join(
                        node_names.withColumnsRenamed({"node_id": "_target", "name": "_tname"}),
                        "_target",
                    )
                    .filter(F.col("_tname").isNotNull())
                    .select(
                        "node_id",
                        F.map_from_arrays(
                            F.array(F.lit(f"{rship}Name")), F.array(F.col("_tname"))
                        ).alias("props"),
                        F.lit(seq).alias("seq"),
                    )
                )
                prop_adds.append(denorm)

    # ---- pass 2: FK edges from the node table itself -----------------------
    node_table_rships = find_relationships(list(dbo.columns))
    add_fk_edges(dbo, node_table_rships, seq=2)

    # ---- pass 3: decorators ------------------------------------------------
    for tname in groups["decorators"]:
        df = tables[tname]
        cols = list(df.columns)
        if "DB_ID" not in cols:
            continue
        # identifier-cache renames (ReactomeLoader.groovy:125-134)
        if tname in ("DatabaseIdentifier", "ReferenceEntity") and "identifier" in cols:
            df = df.withColumnRenamed("identifier", "name")
            ident_parts.append(
                df.select(
                    F.lit(tname).alias("label"),
                    _clean(F.col("name")).alias("key"),
                    F.col("DB_ID").cast("long").alias("node_id"),
                ).filter(F.col("key").isNotNull())
            )
        elif tname.startswith("GO_") and "accession" in cols:
            df = df.withColumnRenamed("accession", "id")
            ident_parts.append(
                df.select(
                    F.lit(tname).alias("label"),
                    # leading zeros stripped (ReactomeLoader.groovy:158)
                    F.col("id").cast("long").cast("string").alias("key"),
                    F.col("DB_ID").cast("long").alias("node_id"),
                ).filter(F.col("key").isNotNull())
            )
        cols = list(df.columns)
        rships = find_relationships(cols)
        props = find_props(cols, rships)
        label_adds.append(
            df.select(F.col("DB_ID").cast("long").alias("node_id"), F.lit(tname).alias("label"))
        )
        if props:
            prop_adds.append(
                df.select(
                    F.col("DB_ID").cast("long").alias("node_id"),
                    _props_map(props).alias("props"),
                    F.lit(3).alias("seq"),
                )
            )
        add_fk_edges(df, rships, seq=3)

    # ---- pass 4: newnodes (value nodes + ranked edges) ---------------------
    for tname in groups["newnodes"]:
        df = tables[tname]
        cols = list(df.columns)
        props = find_props(cols)
        if len(cols) != 3 or len(props) != 1 or f"{props[0]}_rank" not in cols:
            raise ValueError(
                f"newnodes table {tname} violates the 3-col/<prop>_rank convention"
            )
        prop = props[0]
        label = prop[:1].upper() + prop[1:]
        rel_type = camel_to_constant(prop)
        rows = df.filter(
            F.col("DB_ID").isNotNull() & _clean(F.col(prop)).isNotNull()
        )
        new_node_parts.append(
            rows.select(
                _value_node_id(label, F.col(prop)).alias("node_id"),
                F.col(prop).alias("name"),
                F.lit(label).alias("label"),
            )
        )
        edge_parts.append(
            rows.select(
                F.col("DB_ID").cast("long").alias("src"),
                _value_node_id(label, F.col(prop)).alias("dst"),
                F.lit(rel_type).alias("rel_type"),
                F.map_filter(
                    F.map_from_arrays(
                        F.array(F.lit("rank")), F.array(_clean(F.col(f"{prop}_rank")))
                    ),
                    lambda k, v: v.isNotNull(),
                ).alias("props"),
            )
        )

    # ---- pass 5: pure m:m relationship tables ------------------------------
    for tname in groups["relationships"]:
        df = tables[tname]
        cols = list(df.columns)
        rships = find_relationships(cols)
        props = find_props(cols, rships)
        if len(cols) != 4 or len(rships) != 1 or props:
            raise ValueError(
                f"relationship table {tname} violates the 4-col/1-rship convention"
            )
        add_fk_edges(df, rships, seq=5)

    # ---- assemble: label union (A3), prop merge (A2), edge dedup (A7) ------
    labels_extra = None
    if label_adds:
        labels_extra = label_adds[0]
        for more in label_adds[1:]:
            labels_extra = labels_extra.unionByName(more)
        labels_extra = labels_extra.groupBy("node_id").agg(
            F.array_sort(F.collect_set("label")).alias("extra_labels")
        )

    nodes = base_nodes
    if labels_extra is not None:
        nodes = nodes.join(labels_extra, "node_id", "left").select(
            "node_id",
            "name",
            F.array_sort(
                F.array_union("labels", F.coalesce("extra_labels", F.array().cast("array<string>")))
            ).alias("labels"),
        )
    else:
        nodes = nodes.select("node_id", "name", F.array_sort("labels").alias("labels"))

    if prop_adds:
        all_props = prop_adds[0]
        for more in prop_adds[1:]:
            all_props = all_props.unionByName(more)
        # canonical props rendering breaks (node_id, seq) ties: two same-seq
        # decorator tables writing the same prop key would otherwise merge in
        # collect_list order — partition-dependent, breaking reproducible
        # node props (same fix as graph.build_nodes)
        pkey = F.concat_ws(
            "\x1e",
            F.array_sort(
                F.transform(
                    F.map_entries(F.col("props")),
                    lambda e: F.concat_ws("\x1f", e["key"], e["value"]),
                )
            ),
        )
        merged = all_props.withColumn("_pkey", pkey).groupBy("node_id").agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seq", "_pkey", "props")),
                        lambda l, r: F.when(l["seq"] < r["seq"], -1)
                        .when(l["seq"] > r["seq"], 1)
                        .when(l["_pkey"] < r["_pkey"], -1)
                        .when(l["_pkey"] > r["_pkey"], 1)
                        .otherwise(0),
                    ),
                    lambda s: s["props"],
                ),
                F.create_map().cast("map<string,string>"),
                lambda acc, m: F.map_concat(
                    F.map_filter(acc, lambda k, _: ~F.array_contains(F.map_keys(m), k)), m
                ),
            ).alias("props")
        )
        nodes = nodes.join(merged, "node_id", "left").withColumn(
            "props", F.coalesce("props", F.create_map().cast("map<string,string>"))
        )
    else:
        nodes = nodes.withColumn("props", F.create_map().cast("map<string,string>"))

    if new_node_parts:
        vn = new_node_parts[0]
        for more in new_node_parts[1:]:
            vn = vn.unionByName(more)
        value_nodes = (
            vn.groupBy("node_id")
            .agg(
                F.first("name").alias("name"),
                F.array_sort(F.array_union(F.collect_set("label"), F.array(F.lit("Reactome")))).alias("labels"),
            )
            .withColumn("props", F.create_map().cast("map<string,string>"))
        )
        nodes = nodes.unionByName(value_nodes)

    if edge_parts:
        edges = edge_parts[0]
        for more in edge_parts[1:]:
            edges = edges.unionByName(more)
    else:
        # a dump with no relationship columns / newnodes is legal: return a
        # graph with zero edges instead of IndexError on the driver
        edges = nodes.sparkSession.createDataFrame(
            [], "src long, dst long, rel_type string, props map<string,string>"
        )
    # resolve only edges whose endpoints exist; dangling -> metric (J2)
    ids = nodes.select(F.col("node_id").alias("_id"))
    resolved = (
        edges.join(ids.withColumnsRenamed({"_id": "src"}), "src", "left_semi")
        .join(ids.withColumnsRenamed({"_id": "dst"}), "dst", "left_semi")
        .dropDuplicates(["src", "rel_type", "dst"])
    )
    dangling = edges.join(
        resolved.select("src", "rel_type", "dst"), ["src", "rel_type", "dst"], "left_anti"
    )

    if ident_parts:
        ident = ident_parts[0]
        for more in ident_parts[1:]:
            ident = ident.unionByName(more)
    else:
        ident = None

    return {
        "nodes": nodes,
        "edges": resolved,
        "dangling_edges": dangling,
        "identifier_index": ident,
        "groups": groups,
    }

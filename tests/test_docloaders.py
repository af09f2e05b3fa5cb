"""Document-collection loader tests (GrameneMongoLoader family analogs)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from graphene_spark import docloaders

ONTO_SCHEMA = (
    "_id long, name string, namespace string, is_obsolete boolean, "
    "synonym array<string>, xref array<string>, relationship array<string>, "
    "property_value string, subset array<string>"
)


@pytest.fixture(scope="module")
def onto_docs(spark):
    rows = [
        (1, "growth", "biological_process", False, ["growing"], ["UniProt:P1", "GC_ID:9"],
         ["part_of GO:0000002 ! dev"], "has_rank NCBITaxon:species", ["goslim_plant"]),
        (2, "development", "biological_process", False, None, ["Reactome:R1 extra desc"], None, None, None),
        (3, "obsolete thing", "molecular_function", True, None, None, None, None, None),
        (None, "no id", None, False, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, schema=ONTO_SCHEMA)


def test_load_ontology_nodes(spark, onto_docs):
    out = docloaders.load_ontology(onto_docs, "GO")
    nodes = {r["name"]: r for r in out["nodes"].collect()}
    # obsolete + id-less rows dropped (P3/P2)
    assert "GO:3" not in nodes and len([n for n in nodes if n.startswith("GO:")]) == 2
    n1 = nodes["GO:1"]
    assert "GO" in n1["labels"] and "Ontology" in n1["labels"]
    assert "BiologicalProcess" in n1["labels"]  # namespace CamelCase (P7)
    assert "GoslimPlant" in n1["labels"]  # subset label
    assert n1["props"]["rank"] == "Species"  # P4 rank extract
    # synonym Name node + xref node exist
    assert nodes["growing"]["labels"] == ["Name"]
    assert nodes["UniProt:P1"]["labels"] == ["UniProt"]


def test_load_ontology_edges(spark, onto_docs):
    out = docloaders.load_ontology(onto_docs, "GO")
    edges = {(r["src_name"], r["rel_type"], r["dst_name"]) for r in out["edge_candidates"].collect()}
    assert ("GO:1", "SYNONYM", "growing") in edges
    assert ("GO:1", "XREF", "UniProt:P1") in edges
    # GC_ID dropped (P6)
    assert not any(d.startswith("GC_ID") for _, _, d in edges)
    # split-value key keeps pre-space part only
    assert ("GO:2", "XREF", "Reactome:R1") in edges
    # relationship parse: pred upper, zeros stripped (P5)
    assert ("GO:1", "PART_OF", "GO:2") in edges


GENE_SCHEMA = (
    "_id string, name string, taxon_id long, map string, region string, "
    "start int, end int, xrefs map<string, array<string>>"
)


@pytest.fixture(scope="module")
def gene_docs(spark):
    rows = [
        ("g1", "Gene One", 10, "chr", "1", 100, 200, {"GO": ["0000001:IEA"]}),
        ("g2", "Gene Two", 10, "chr", "1", 300, 400, None),
        ("g3", "Gene Three", 11, "chr", "2", 50, 60, None),
        ("", "empty id", 10, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, schema=GENE_SCHEMA)


def test_load_genes(spark, gene_docs):
    taxa = spark.createDataFrame([(10, "Oryza"), (11, "Zea")], "taxon_id long, taxon_name string")
    out = docloaders.load_genes(gene_docs, taxa)
    nodes = {r["name"]: r for r in out["nodes"].collect()}
    assert nodes["g1"]["props"]["location"] == "chr:1"
    assert "chr:1" in nodes  # region node
    edges = {(r["src_name"], r["rel_type"], r["dst_name"]) for r in out["edge_candidates"].collect()}
    assert ("g1", "SPECIES", "Oryza") in edges
    # W1 adjacency: g1 -> g2 on chr:1; FIRST/LAST per region
    assert ("g1", "NEXT", "g2") in edges
    assert ("chr:1", "FIRST", "g1") in edges
    assert ("chr:1", "LAST", "g2") in edges
    assert ("chr:2", "FIRST", "g3") in edges


def test_gene_ontology_evidence_join(spark, gene_docs):
    out = docloaders.load_gene_ontology_xrefs(gene_docs.filter("_id = 'g1'"))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_name"], r["rel_type"], r["dst_name"]) == ("g1", "GO", "GO:1")
    assert r["props"]["evidence"] == "IEA"


def test_load_taxonomy(spark):
    docs = spark.createDataFrame(
        [(1, "root", "no rank", None, None, None),
         (2, "Plantae", "kingdom", [1], None, ["green plants"]),
         (3, "Zea", "genus", [2, 1], [99, 1], None)],
        "_id long, name string, rank string, is_a array<long>, "
        "alt_id array<long>, synonym array<string>",
    )
    out = docloaders.load_taxonomy(docs)
    nodes = {r["name"]: r for r in out["nodes"].collect()}
    # labels = [Taxon, <rank camel>, NCBITaxonomy] sorted (NCBITaxonLoader.groovy:19)
    assert nodes["Zea"]["labels"] == ["Genus", "NCBITaxonomy", "Taxon"]
    assert nodes["root"]["labels"] == ["NCBITaxonomy", "NoRank", "Taxon"]
    assert nodes["green plants"]["labels"] == ["Name"]  # synonym Name node
    edges = {(r["src_name"], r["rel_type"], r["dst_name"])
             for r in out["edge_candidates"].collect()}
    # parent = FIRST is_a entry only (parentTaxonId, :41-50)
    assert ("Zea", "SUPER_TAXON", "Plantae") in edges
    assert ("Zea", "SUPER_TAXON", "root") not in edges
    assert ("Plantae", "SUPER_TAXON", "root") in edges
    # alt_id fan-out; unresolved alt dropped to dangling (Loader.groovy:45-47)
    assert ("Zea", "ALT_ID", "root") in edges
    dang = [(r["src_name"], r["rel_type"], r["dst_name"])
            for r in out["dangling"].collect()]
    assert dang == [("Zea", "ALT_ID", "99")]
    assert ("Plantae", "SYNONYM", "green plants") in edges


def test_load_domains_and_suppression(spark):
    docs = spark.createDataFrame(
        [(1, "IPR000001", "Family", {"pfam": ["PF00001", "PF00002"], "prosite": ["PS0001"]}),
         (2, "IPR000002", "Domain", {"pfam": ["PF00001"]})],
        "_id long, name string, type string, descriptors map<string, array<string>>",
    )
    out = docloaders.load_domains(docs)
    nodes = {r["name"]: r for r in out["nodes"].collect()}
    assert nodes["IPR000001"]["labels"] == ["Family", "InterPro"]
    assert nodes["PF00001"]["labels"] == ["InterProSignature", "pfam"]
    edges = {(r["src_name"], r["rel_type"], r["dst_name"])
             for r in out["edge_candidates"].collect()}
    assert ("PF00001", "CONTRIBUTES_TO", "IPR000001") in edges
    assert ("PF00001", "CONTRIBUTES_TO", "IPR000002") in edges
    assert len(edges) == 4
    # signature-type set feeds the J11 suppression (GeneLoader.groovy:158-160)
    sig = {r["sig_type"] for r in out["signature_types"].collect()}
    assert sig == {"pfam", "prosite"}
    feats = spark.createDataFrame(
        [("g1", "Pfam"), ("g1", "signal_peptide"), ("g2", "PROSITE")],
        "gene string, feature_type string",
    )
    kept = docloaders.suppress_signature_features(feats, out["signature_types"])
    assert [r["feature_type"] for r in kept.collect()] == ["signal_peptide"]


def test_load_ontology_colonless_xref_dropped_not_crash(spark):
    """A colon-less xref must drop (null value) — getItem(1) on a 1-element
    split THROWS under ANSI mode."""
    from graphene_spark import docloaders

    docs = spark.createDataFrame(
        [(1, "growth", "bp", False, None, ["TAIR", "GO:123"], None, None, None)],
        "_id long, name string, namespace string, is_obsolete boolean, synonym array<string>, "
        "xref array<string>, relationship array<string>, property_value string, subset array<string>",
    )
    out = docloaders.load_ontology(docs, "GO")
    xrefs = {r["dst_name"] for r in
             out["edge_candidates"].filter("rel_type = 'XREF'").collect()}
    assert xrefs == {"GO:123"}


def test_load_ontology_term_beats_name_node_on_collision(spark):
    """A synonym string equal to another term's name must NOT replace the
    term node's labels with a bare [Name] node (deterministic priority)."""
    from graphene_spark import docloaders

    docs = spark.createDataFrame(
        [(1, "growth", "bp", False, ["GO:2"], None, None, None, None),
         (2, "dev", "bp", False, None, None, None, None, None)],
        "_id long, name string, namespace string, is_obsolete boolean, synonym array<string>, "
        "xref array<string>, relationship array<string>, property_value string, subset array<string>",
    )
    out = docloaders.load_ontology(docs, "GO")
    row = out["nodes"].filter("name = 'GO:2'").collect()
    assert len(row) == 1 and "Ontology" in row[0]["labels"], row

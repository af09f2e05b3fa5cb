"""MySQL-dump source reader + star-schema loader tests (S1-S3, §3.3 passes)."""

from __future__ import annotations

import os

import pytest

from graphene_spark import starloader
from graphene_spark.sources import mysqldump

DUMP = """\
-- MySQL dump fixture
CREATE TABLE `DatabaseObject` (
  `DB_ID` int(10) unsigned NOT NULL,
  `_displayName` text,
  `_class` varchar(64) NOT NULL,
  `created` int(10) unsigned DEFAULT NULL,
  `created_class` varchar(64) DEFAULT NULL,
  PRIMARY KEY (`DB_ID`)
) ENGINE=MyISAM;

INSERT INTO `DatabaseObject` VALUES (1,'Pathway One','Pathway',3,'InstanceEdit'),(2,'Reaction: A, B','Reaction',3,'InstanceEdit'),(3,'Edit #1','InstanceEdit',NULL,NULL),(4,'Some Entity','PhysicalEntity',NULL,NULL);

CREATE TABLE `Pathway` (
  `DB_ID` int(10) unsigned NOT NULL,
  `doi` varchar(100) DEFAULT NULL,
  `species` int(10) unsigned DEFAULT NULL,
  `species_class` varchar(64) DEFAULT NULL
) ENGINE=MyISAM;

INSERT INTO `Pathway` VALUES (1,'10.1000/x',4,'PhysicalEntity');

CREATE TABLE `Event_2_input` (
  `DB_ID` int(10) unsigned NOT NULL,
  `input` int(10) unsigned DEFAULT NULL,
  `input_class` varchar(64) DEFAULT NULL,
  `input_rank` int(10) unsigned DEFAULT NULL
) ENGINE=MyISAM;

INSERT INTO `Event_2_input` VALUES (2,4,'PhysicalEntity',0),(2,4,'PhysicalEntity',1);

CREATE TABLE `Pathway_2_name` (
  `DB_ID` int(10) unsigned NOT NULL,
  `name` text,
  `name_rank` int(10) unsigned DEFAULT NULL
) ENGINE=MyISAM;

INSERT INTO `Pathway_2_name` VALUES (1,'pathway one',0),(1,'the first pathway',1);
"""


@pytest.fixture(scope="module")
def dump_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("dump") / "mini.sql"
    p.write_text(DUMP, encoding="ISO-8859-1")
    return str(p)


def test_parse_ddl(dump_path):
    ddl = mysqldump.parse_ddl(dump_path)
    assert ddl["DatabaseObject"] == ["DB_ID", "_displayName", "_class", "created", "created_class"]
    assert ddl["Event_2_input"] == ["DB_ID", "input", "input_class", "input_rank"]


def test_read_table_values_and_nulls(spark, dump_path):
    rows = {
        r["DB_ID"]: r
        for r in mysqldump.read_table(spark, dump_path, "DatabaseObject").collect()
    }
    assert len(rows) == 4
    assert rows["1"]["_displayName"] == "Pathway One"
    # quoted comma inside value survives CSV parsing
    assert rows["2"]["_displayName"] == "Reaction: A, B"
    # NULL sentinel -> real null
    assert rows["3"]["created"] is None


def test_read_table_quote_aware_tuple_split(spark, tmp_path):
    """A value containing '),(' must NOT split the tuple — the reference's
    quote-tracking state machine semantics (LoadMysqlDump.groovy:204-226)."""
    dump = (
        "CREATE TABLE `t` (\n  `id` int(10) NOT NULL,\n  `v` text\n) ENGINE=MyISAM;\n\n"
        "INSERT INTO `t` VALUES (1,'a),(b'),(2,'c (paren) d'),(3,'e\\'),(f'),(4,NULL);\n"
    )
    p = tmp_path / "tricky.sql"
    p.write_text(dump, encoding="ISO-8859-1")
    rows = {r["id"]: r["v"] for r in mysqldump.read_table(spark, str(p), "t").collect()}
    assert rows == {"1": "a),(b", "2": "c (paren) d", "3": "e'),(f", "4": None}


def test_classify_tables():
    got = starloader.classify_tables(
        ["DatabaseObject", "Pathway", "Event_2_input", "Pathway_2_name"]
    )
    assert got["special"] == ["DatabaseObject"]
    assert got["decorators"] == ["Pathway"]
    assert got["relationships"] == ["Event_2_input"]
    assert got["newnodes"] == ["Pathway_2_name"]


def test_find_relationships_and_props():
    cols = ["DB_ID", "doi", "species", "species_class", "extra_col"]
    rships = starloader.find_relationships(cols)
    assert rships == ["species"]
    # underscore-containing and DB_ID removed
    assert starloader.find_props(cols, rships) == ["doi"]


def test_camel_to_constant():
    assert starloader.camel_to_constant("stableIdentifier") == "STABLE_IDENTIFIER"
    assert starloader.camel_to_constant("input") == "INPUT"


def test_build_star_graph_end_to_end(spark, dump_path):
    tables = mysqldump.read_all_tables(spark, dump_path)
    g = starloader.build_star_graph(tables)
    nodes = {r["node_id"]: r for r in g["nodes"].collect()}
    edges = {(r["src"], r["dst"], r["rel_type"]): r for r in g["edges"].collect()}

    # pass 1: DB_ID nodes with _class + Reactome labels
    assert nodes[1]["name"] == "Pathway One"
    assert "Reaction" in nodes[2]["labels"] and "Reactome" in nodes[2]["labels"]

    # pass 2: m:1 created edge + denormalized createdName prop (J6)
    assert (1, 3, "CREATED") in edges
    assert nodes[1]["props"].get("createdName") == "Edit #1"

    # pass 3: decorator adds label + prop + FK edge
    assert "Pathway" in nodes[1]["labels"]
    assert nodes[1]["props"].get("doi") == "10.1000/x"
    assert (1, 4, "SPECIES") in edges

    # pass 4: newnodes create value nodes + ranked NAME edges (W2)
    name_nodes = {r["name"]: r for r in g["nodes"].filter("node_id < 0").collect()}
    assert "pathway one" in name_nodes and "the first pathway" in name_nodes
    nn = name_nodes["pathway one"]
    assert "Name" in nn["labels"]
    e = edges[(1, nn["node_id"], "NAME")]
    assert e["props"]["rank"] == "0"

    # pass 5: m:m edge with rank; duplicate (src,rel,dst) deduped (A7)
    assert (2, 4, "INPUT") in edges
    n_input = g["edges"].filter("rel_type = 'INPUT'").count()
    assert n_input == 1


def test_merge_insert_absent_null_key_idempotent(spark, tmp_path):
    """Rows with a NULL key value must not be re-inserted on replay — the
    anti-join must agree with dropDuplicates' null-equality semantics."""
    from graphene_spark import materialize

    path = str(tmp_path / "merged")
    df = spark.createDataFrame(
        [(1, None), (1, "x"), (2, "y")], "src long, obj string"
    )
    n1 = materialize.merge_insert_absent(spark, df, path, ["src", "obj"])
    n2 = materialize.merge_insert_absent(spark, df, path, ["src", "obj"])
    assert n1 == 3 and n2 == 0
    assert materialize.read_merged(spark, path).count() == 3

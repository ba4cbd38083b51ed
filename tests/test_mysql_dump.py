"""MySQL-dump source vs the parquet twins (S1/S2 — the reference's actual
input format, LoadMysqlDump.groovy:34-249).

The fixture writes the reactome-side tables BOTH as parquet and as a
mysqldump-shaped .sql file; reading the dump through the distributed
byte-range scanner and casting to the parquet schema must reproduce the
parquet tables exactly."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _dump_path(fixture_dir: str) -> str:
    return os.path.join(fixture_dir, "reactome_dump.sql")


def test_schema_scan(smoke_fixture_dir):
    from graphene_loader_ray.sources.mysql_dump import scan_dump_schema

    tables = scan_dump_schema(_dump_path(smoke_fixture_dir))
    assert set(tables) == {"vocab_objects", "vocab_edges"}
    assert tables["vocab_objects"].columns == \
        ["DB_ID", "_displayName", "_class", "identifier", "accession",
         "ec_number"]
    assert len(tables["vocab_objects"].ranges) >= 2   # multiple INSERT lines


def test_dump_roundtrip_equals_parquet(smoke_fixture_dir):
    from graphene_loader_ray.sources.mysql_dump import (cast_dump_table,
                                                        read_mysql_dump,
                                                        scan_dump_schema)

    schema = scan_dump_schema(_dump_path(smoke_fixture_dir))
    for name in ("vocab_objects", "vocab_edges"):
        gold = pq.read_table(os.path.join(smoke_fixture_dir,
                                          f"{name}.parquet"))
        ds = read_mysql_dump(_dump_path(smoke_fixture_dir), name,
                             schema=schema)
        typed = pa.Table.from_pandas(
            cast_dump_table(ds, gold.schema).to_pandas(),
            schema=gold.schema)
        sort_key = gold.column_names[:3]
        a = typed.sort_by([(c, "ascending") for c in sort_key]).to_pylist()
        b = gold.sort_by([(c, "ascending") for c in sort_key]).to_pylist()
        assert a == b, name


def test_raw_surface_is_all_strings_with_null_literal(smoke_fixture_dir):
    """The reference's row surface: every value a string; SQL NULL is the
    literal 'NULL' (LoadMysqlDump.groovy:172-175; consumers test
    `!= 'NULL'`, ReactomeLoader.groovy:250)."""
    from graphene_loader_ray.sources.mysql_dump import read_mysql_dump

    t = read_mysql_dump(_dump_path(smoke_fixture_dir), "vocab_objects") \
        .to_pandas()
    assert all(t[c].map(lambda v: isinstance(v, str)).all()
               for c in t.columns)
    assert (t["identifier"] == "NULL").any()          # nulls as literal


def test_quote_escape_and_bail_rules(tmp_path):
    """Adversarial dump: quoted commas, escaped quotes/backslashes, a
    no-data table (dropped), and a truncated table closed by the next
    banner (the reference's bail rule)."""
    import ray.data as rd

    from graphene_loader_ray.sources.mysql_dump import (read_mysql_dump,
                                                        scan_dump_schema)

    dump = tmp_path / "d.sql"
    dump.write_text(
        "-- Table structure for table `t1`\n"
        "CREATE TABLE `t1` (\n"
        "  `id` int(11) NOT NULL,\n"
        "  `name` varchar(255) DEFAULT NULL\n"
        ") ENGINE=InnoDB;\n"
        "INSERT INTO `t1` VALUES (1,'a,b'),(2,'it\\'s'),(3,'back\\\\slash');\n"
        "INSERT INTO `t1` VALUES (4,NULL);\n"
        "-- Table structure for table `empty_t`\n"
        "CREATE TABLE `empty_t` (\n"
        "  `x` int(11) NOT NULL\n"
        ") ENGINE=InnoDB;\n"
        "-- Table structure for table `t2`\n"
        "CREATE TABLE `t2` (\n"
        "  `k` int(11) NOT NULL\n"
        ") ENGINE=InnoDB;\n"
        "INSERT INTO `t2` VALUES (7);\n",
        encoding="iso-8859-1")
    tables = scan_dump_schema(str(dump))
    assert set(tables) == {"t1", "t2"}                # empty_t dropped
    rows = read_mysql_dump(str(dump), "t1", schema=tables).to_pandas() \
        .sort_values("id").to_dict("records")
    assert rows == [{"id": "1", "name": "a,b"},
                    {"id": "2", "name": "it's"},
                    {"id": "3", "name": "back\\slash"},
                    {"id": "4", "name": "NULL"}]
    t2 = read_mysql_dump(str(dump), "t2", schema=tables).to_pandas()
    assert t2["k"].tolist() == ["7"]

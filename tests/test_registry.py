"""Registry (db/space/alias) parity — the master's metadata verbs
(internal/entity/alias.go, db.go; routes doc_http.go:237-241)."""

import pytest

from vearch_spark.errors import SchemaError
from vearch_spark.registry import Registry
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema


def make_schema(name="docs"):
    return SpaceSchema(
        name=name,
        fields=[
            FieldSpec("field_int", FieldType.INT, index=IndexSpec("field_int", "SCALAR")),
        ],
    )


@pytest.fixture()
def reg(spark):
    r = Registry(spark)
    r.create_db("db1")
    return r


def test_db_lifecycle(reg):
    assert reg.list_dbs() == ["db1"]
    with pytest.raises(SchemaError):
        reg.create_db("db1")
    reg.create_db("db2")
    reg.drop_db("db2")
    assert reg.list_dbs() == ["db1"]
    with pytest.raises(SchemaError):
        reg.drop_db("nope")


def test_space_lifecycle(reg):
    sp = reg.create_space("db1", make_schema())
    assert reg.list_spaces("db1") == ["docs"]
    assert reg.space("db1", "docs") is sp
    with pytest.raises(SchemaError):
        reg.create_space("db1", make_schema())  # duplicate name
    with pytest.raises(SchemaError):
        reg.create_space("nope", make_schema())
    # db with spaces cannot be dropped (master rule)
    with pytest.raises(SchemaError):
        reg.drop_db("db1")
    reg.drop_space("db1", "docs")
    with pytest.raises(SchemaError):
        reg.space("db1", "docs")
    reg.drop_db("db1")


def test_alias_resolution(reg):
    sp = reg.create_space("db1", make_schema())
    reg.create_alias("hot", "db1", "docs")
    assert reg.get_alias("hot") == ("db1", "docs")
    # alias resolves through the same lookup as a real name
    assert reg.space("db1", "hot") is sp
    with pytest.raises(SchemaError):
        reg.create_alias("hot", "db1", "docs")  # duplicate
    with pytest.raises(SchemaError):
        reg.create_alias("bad", "db1", "nope")  # dangling target
    other = reg.create_space("db1", make_schema("docs2"))
    reg.update_alias("hot", "db1", "docs2")
    assert reg.space("db1", "hot") is other
    # dropping the target cascades the alias away
    reg.drop_space("db1", "docs2")
    with pytest.raises(SchemaError):
        reg.get_alias("hot")
    reg.create_alias("gone", "db1", "docs")
    reg.delete_alias("gone")
    with pytest.raises(SchemaError):
        reg.delete_alias("gone")


def test_real_name_wins_over_alias(reg):
    sp1 = reg.create_space("db1", make_schema())
    sp2 = reg.create_space("db1", make_schema("docs2"))
    # an alias sharing a real space's name never shadows it
    reg.create_alias("docs2", "db1", "docs")
    assert reg.space("db1", "docs2") is sp2
    assert sp1 is not sp2


def test_alias_does_not_resolve_under_missing_db(spark):
    reg = Registry(spark)
    reg.create_db("db1")
    reg.create_space("db1", SpaceSchema(name="s1", fields=[
        FieldSpec("v", FieldType.VECTOR, dimension=2, index=IndexSpec("v", "FLAT")),
    ]))
    reg.create_alias("a", "db1", "s1")
    assert reg.space("db1", "a").schema.name == "s1"
    with pytest.raises(SchemaError, match="database"):
        reg.space("nope", "a")

"""RBAC enforced at the verb surface — the BasicAuthMiddleware +
Role.HasPermissionForResources chain (doc_http.go:69-131,
user.go:191-313) driven through api verbs, mirroring the reference's
test/test_module_user.py privilege matrix."""

import pytest

from vearch_spark import api
from vearch_spark.errors import SchemaError
from vearch_spark.registry import Registry
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema


def _schema(name="docs"):
    return SpaceSchema(
        name=name,
        fields=[
            FieldSpec("field_int", FieldType.INT,
                      index=IndexSpec("field_int", "SCALAR")),
            FieldSpec("v", FieldType.VECTOR, dimension=4,
                      index=IndexSpec("v", "FLAT")),
        ],
    )


@pytest.fixture()
def rig(spark, tmp_path):
    reg = Registry(spark, root=str(tmp_path / "rbac"))
    reg.create_db("db1")
    sp = reg.create_space("db1", _schema())
    api.upsert(sp, {"documents": [
        {"_id": str(i), "field_int": i, "v": [float(i), 0.0, 1.0, 0.0]}
        for i in range(5)
    ]})
    reg.auth.create_role("docWriter", {"ResourceDocument": "WriteOnly"})
    reg.auth.create_role("docReader", {"ResourceDocument": "ReadOnly"})
    reg.auth.create_user("writer", "pw1", "docWriter")
    reg.auth.create_user("reader", "pw2", "docReader")
    reg.auth.create_user("clusteradmin", "pw3", "defaultClusterAdmin")
    return reg, sp


SEARCH_REQ = {"vectors": [{"field": "v", "feature": [1.0, 0.0, 1.0, 0.0]}],
              "limit": 3}


def test_writeonly_user_rejected_on_search(rig):
    reg, sp = rig
    with pytest.raises(SchemaError, match="lacks read privilege"):
        api.search(sp, SEARCH_REQ, user="writer")
    with pytest.raises(SchemaError, match="lacks read privilege"):
        api.query(sp, {"limit": 1}, user="writer")
    # but writes serve
    assert api.upsert(
        sp, {"documents": [{"_id": "w1", "field_int": 9,
                            "v": [9.0, 0.0, 1.0, 0.0]}]},
        user="writer",
    ) == 1
    assert api.delete(sp, {"document_ids": ["w1"]}, user="writer") == ["w1"]


def test_readonly_user_rejected_on_upsert_and_delete(rig):
    reg, sp = rig
    with pytest.raises(SchemaError, match="lacks write privilege"):
        api.upsert(sp, {"documents": [{"_id": "x", "field_int": 1,
                                       "v": [0.0] * 4}]}, user="reader")
    with pytest.raises(SchemaError, match="lacks write privilege"):
        api.delete(sp, {"document_ids": ["0"]}, user="reader")
    # reads serve
    assert api.search(sp, SEARCH_REQ, user="reader").count() == 3
    assert api.query(sp, {"limit": 2}, user="reader").count() == 2


def test_root_passes_everything_and_is_undeletable(rig):
    reg, sp = rig
    assert api.search(sp, SEARCH_REQ, user="root").count() == 3
    assert api.search(sp, SEARCH_REQ).count() == 3  # default user=root
    with pytest.raises(SchemaError, match="root"):
        api.drop_user(reg, "root")


def test_admin_verbs_guarded_by_resource_class(rig):
    reg, sp = rig
    # a document-only role has no ResourceDB / ResourceSpace / etc.
    with pytest.raises(SchemaError, match="lacks write privilege"):
        api.create_db(reg, "db2", user="writer")
    with pytest.raises(SchemaError, match="lacks read privilege"):
        api.list_dbs(reg, user="writer")
    with pytest.raises(SchemaError, match="lacks write privilege"):
        api.create_user(reg, {"name": "u", "password": "p",
                              "role_name": "docReader"}, user="reader")
    with pytest.raises(SchemaError, match="lacks write privilege"):
        api.index_rebuild(sp, user="reader")
    with pytest.raises(SchemaError, match="lacks write privilege"):
        api.delete_index(sp, "field_int", user="reader")
    # defaultClusterAdmin covers db/space/alias/index/config/cluster
    api.create_db(reg, "db2", user="clusteradmin")
    assert {"name": "db1"} in api.list_dbs(reg, user="clusteradmin")
    api.update_config(sp, {"refresh_interval": 500}, user="clusteradmin")
    assert api.get_config(sp, user="clusteradmin")["refresh_interval"] == 500
    api.cluster_health(reg, user="clusteradmin")
    # ...but NOT user administration (no ResourceUser in its matrix?
    # it HAS ResourceUser per user.go:94-112 — verify the grant works)
    api.create_user(reg, {"name": "u2", "password": "p",
                          "role_name": "docReader"}, user="clusteradmin")


def test_unknown_user_rejected(rig):
    reg, sp = rig
    with pytest.raises(SchemaError, match="not found"):
        api.search(sp, SEARCH_REQ, user="ghost")


def test_standalone_space_skips_auth(spark):
    """A Space outside any Registry carries no auth store — the
    reference's SkipAuth deployment mode (doc_http.go:180-183)."""
    from vearch_spark.space import Space

    sp = Space(spark, _schema("solo"))
    sp.upsert([{"_id": "1", "field_int": 1, "v": [1.0, 0.0, 1.0, 0.0]}])
    assert api.search(sp, dict(SEARCH_REQ, limit=1), user="whoever").count() == 1


def test_grant_revoke_changes_take_effect_immediately(rig):
    reg, sp = rig
    reg.auth.change_role_privilege(
        "docReader", "Grant", {"ResourceDocument": "WriteRead"}
    )
    assert api.upsert(sp, {"documents": [{"_id": "g", "field_int": 1,
                                          "v": [0.0] * 4}]},
                      user="reader") == 1
    reg.auth.change_role_privilege(
        "docReader", "Revoke", {"ResourceDocument": "WriteRead"}
    )
    with pytest.raises(SchemaError, match="lacks"):
        api.query(sp, {"limit": 1}, user="reader")


def test_cache_routes_resource_class(rig):
    """/cache/* routes parse to ResourceCache (user.go:263-266) and
    return the live record — the drift-free cached view."""
    reg, sp = rig
    assert api.cache_space_info(reg, "db1", "docs")["name"] == "docs"
    assert api.cache_user_info(reg, "reader") == {
        "name": "reader", "role_name": "docReader"}
    assert api.cache_role_info(reg, "docWriter")["privileges"] == {
        "ResourceDocument": "WriteOnly"}
    # a document-only role holds no ResourceCache privilege
    with pytest.raises(SchemaError, match="lacks read privilege"):
        api.cache_space_info(reg, "db1", "docs", user="reader")
    reg.auth.create_role("cacheReader", {"ResourceCache": "ReadOnly"})
    reg.auth.create_user("debugger", "pw", "cacheReader")
    assert api.cache_role_info(reg, "root", user="debugger")["name"] == "root"


def test_route_sweep_completions(rig, tmp_path):
    reg, sp = rig
    assert api.describe_db(reg, "db1") == {
        "name": "db1", "space_num": 1, "spaces": ["docs"]}
    with pytest.raises(SchemaError):
        api.describe_db(reg, "nope")
    # built-ins are never listed; user-defined roles are
    names = [r["name"] for r in api.list_roles(reg)]
    assert "docWriter" in names and "root" not in names
    # create_index: scalar index on an unindexed field via the route
    out = api.create_index(reg, "db1", "docs",
                           {"field": "field_int", "type": "SCALAR"})
    assert "field_int" in str(out)
    with pytest.raises(SchemaError, match="lacks"):
        api.create_index(reg, "db1", "docs", {"field": "field_int"},
                         user="reader")
    # backup version listing + direct delete round-trip
    bdir = str(tmp_path / "b")
    vid = api.backup_space(reg, "db1", "docs",
                           {"command": "create", "path": bdir})["backup_id"]
    assert api.list_backup_versions(
        reg, "db1", "docs", {"path": bdir})["versions"] == [vid]
    out = api.delete_backup_version(reg, "db1", "docs", {"path": bdir},
                                    vid, direct=True)
    assert out["deleted"] is True
    assert api.list_backup_versions(
        reg, "db1", "docs", {"path": bdir})["versions"] == []


# -------------------------------------------- authentication on the verb path


def test_credentialed_user_tuple_authenticates_then_authorizes(rig):
    """user=(name, password) is the Basic-Auth analog: authenticate()
    runs BEFORE the privilege check (middleware order), so a wrong
    password fails even for a user whose role would grant the verb."""
    reg, sp = rig
    assert api.search(sp, SEARCH_REQ, user=("reader", "pw2")).count() == 3
    with pytest.raises(SchemaError, match="authentication failed"):
        api.search(sp, SEARCH_REQ, user=("reader", "WRONG"))
    # credentials valid but privilege missing → the authz error
    with pytest.raises(SchemaError, match="lacks read privilege"):
        api.search(sp, SEARCH_REQ, user=("writer", "pw1"))
    with pytest.raises(SchemaError, match="name, password"):
        api.search(sp, SEARCH_REQ, user=("reader",))


def test_require_credentials_rejects_bare_names(rig):
    """With enforcement on, the cooperative bare-name assertion is
    rejected on every gated verb — and enabling it demands that the
    caller themselves present valid credentials."""
    reg, sp = rig
    # enabling with a bare asserted name is refused
    with pytest.raises(SchemaError, match="needs user="):
        api.modify_auth_mode(reg, {"require_credentials": True}, user="root")
    out = api.modify_auth_mode(reg, {"require_credentials": True},
                               user=("root", "secret"))
    assert out == {"require_credentials": True}
    with pytest.raises(SchemaError, match="authentication required"):
        api.search(sp, SEARCH_REQ, user="reader")
    with pytest.raises(SchemaError, match="authentication required"):
        api.list_dbs(reg, user="root")
    assert api.search(sp, SEARCH_REQ, user=("reader", "pw2")).count() == 3
    # disabling restores the embedded-library default; a credentialed
    # caller may disable (a bare name cannot, enforcement is still on)
    api.modify_auth_mode(reg, {"require_credentials": False},
                         user=("root", "secret"))
    assert api.get_auth_mode(reg) == {"require_credentials": False}
    assert api.search(sp, SEARCH_REQ, user="reader").count() == 3


def test_require_credentials_persists_in_catalog(spark, tmp_path):
    from vearch_spark.registry import Registry as R

    root = str(tmp_path / "authmode")
    reg = R(spark, root=root)
    api.modify_auth_mode(reg, {"require_credentials": True},
                         user=("root", "secret"))
    fresh = R.load(spark, root)
    assert fresh.auth.require_credentials is True
    with pytest.raises(SchemaError, match="authentication required"):
        api.list_dbs(fresh, user="root")
    assert api.list_dbs(fresh, user=("root", "secret")) == []


def test_reload_rewires_surviving_space_auth(spark, tmp_path):
    """ADVICE r5: after the ConcurrentWriteError→reload() retry path, a
    surviving Space handle must serve under the RELOADED AuthStore —
    RBAC changes committed by the other Registry apply to it."""
    from vearch_spark.registry import Registry as R

    root = str(tmp_path / "rewire")
    r1 = R(spark, root=root)
    r1.create_db("db1")
    sp = r1.create_space("db1", _schema())
    api.upsert(sp, {"documents": [
        {"_id": "1", "field_int": 1, "v": [1.0, 0.0, 1.0, 0.0]}]})
    # the OTHER registry commits an RBAC change: a new read-only user
    r2 = R.load(spark, root)
    r2.auth.create_role("docReader2", {"ResourceDocument": "ReadOnly"})
    r2.auth.create_user("newbie", "pw", "docReader2")
    r1.reload()
    # the survivor is wired onto the reloaded store...
    assert sp._auth is r1.auth
    # ...so the user committed by r2 is honored on its document verbs
    assert api.query(sp, {"limit": 1}, user="newbie").count() == 1
    with pytest.raises(SchemaError, match="lacks write privilege"):
        api.upsert(sp, {"documents": [
            {"_id": "2", "field_int": 2, "v": [0.0] * 4}]}, user="newbie")

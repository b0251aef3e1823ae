"""RBAC parity (vearch_spark.auth): the master's user/role/privilege
model — built-in roles, Grant/Revoke semantics, name validation
badcases, root protections, the per-request authorize check, and
catalog durability under a rooted Registry (reference:
internal/entity/user.go, master/services/{user,role}_service.go,
test/test_module_user.py + test_module_role.py)."""

import pytest

from vearch_spark import api
from vearch_spark.auth import (
    BUILTIN_ROLES,
    AuthStore,
    Privilege,
    Resource,
    validate_name,
)
from vearch_spark.errors import SchemaError
from vearch_spark.registry import Registry


def test_privilege_matrix():
    assert Privilege.WRITE_READ.grants(True) and Privilege.WRITE_READ.grants(False)
    assert Privilege.READ_ONLY.grants(False) and not Privilege.READ_ONLY.grants(True)
    assert Privilege.WRITE_ONLY.grants(True) and not Privilege.WRITE_ONLY.grants(False)
    assert not Privilege.NONE.grants(True) and not Privilege.NONE.grants(False)
    with pytest.raises(SchemaError):
        Privilege.parse("Admin")
    with pytest.raises(SchemaError):
        Resource.parse("ResourceEverything")


def test_builtin_roles_match_reference_matrix():
    """user.go:90-156 — spot-check the six built-ins' decisive cells."""
    assert BUILTIN_ROLES["root"].allows(Resource.CACHE, True)  # ResourceAll
    sa = BUILTIN_ROLES["defaultSpaceAdmin"]
    assert sa.allows(Resource.SPACE, True)
    assert sa.allows(Resource.ALIAS, False) and not sa.allows(Resource.ALIAS, True)
    assert not sa.allows(Resource.DB, False)  # DB absent entirely
    rd = BUILTIN_ROLES["defaultReadDBSpaceEditDocument"]
    assert rd.allows(Resource.DB, False) and not rd.allows(Resource.DB, True)
    assert rd.allows(Resource.DOCUMENT, True)
    da = BUILTIN_ROLES["defaultDocumentAdmin"]
    assert da.allows(Resource.INDEX, True) and not da.allows(Resource.SPACE, False)


@pytest.mark.parametrize("bad", [
    "", "1abc", "_abc", "a b", "a/b", "a:b", "a*b", "Root", "ROOT",
])
def test_name_validation_badcases(bad):
    """ValidateName badcases (user.go:164-196;
    test_module_user.py::test_user_badcase)."""
    with pytest.raises(SchemaError):
        validate_name(bad, "User", check_root=True)


def test_role_lifecycle_grant_revoke():
    """test_module_role.py order: create → get → revoke → grant →
    drop; built-ins immutable; assigned roles undeletable."""
    st = AuthStore()
    role = st.create_role("role_name", {"ResourceDocument": "ReadOnly"})
    assert st.get_role("role_name").allows(Resource.DOCUMENT, False)
    st.change_role_privilege("role_name", "Revoke", {"ResourceDocument": "ReadOnly"})
    assert not st.get_role("role_name").allows(Resource.DOCUMENT, False)
    st.change_role_privilege("role_name", "Grant", {"ResourceDocument": "WriteRead"})
    assert st.get_role("role_name").allows(Resource.DOCUMENT, True)
    with pytest.raises(SchemaError):
        st.change_role_privilege("role_name", "Toggle", {})
    with pytest.raises(SchemaError):
        st.create_role("defaultSpaceAdmin", {})  # built-in name
    with pytest.raises(SchemaError):
        st.change_role_privilege("root", "Grant", {})  # built-in immutable
    with pytest.raises(SchemaError):
        st.delete_role("defaultSpaceAdmin")
    st.create_user("worker", "pw", "role_name")
    with pytest.raises(SchemaError):
        st.delete_role("role_name")  # still assigned
    st.drop_user("worker")
    st.delete_role("role_name")
    assert st.list_roles() == []
    assert role.name == "role_name"


def test_user_lifecycle_and_root_protections():
    st = AuthStore(root_password="secret")
    st.create_user("alice", "pw1", "defaultSpaceAdmin")
    assert st.get_user("alice") == {"name": "alice", "role_name": "defaultSpaceAdmin"}
    assert "password" not in st.get_user("alice")
    with pytest.raises(SchemaError):
        st.create_user("alice", "pw", "defaultSpaceAdmin")  # duplicate
    with pytest.raises(SchemaError):
        st.create_user("bob", "", "defaultSpaceAdmin")  # empty password
    with pytest.raises(SchemaError):
        st.create_user("bob", "pw", "root")  # root role reserved
    with pytest.raises(SchemaError):
        st.create_user("bob", "pw", "nope")  # unknown role
    # password: self-service requires the old one; admin path doesn't
    st.update_user("alice", password="pw2", old_password="pw1")
    with pytest.raises(SchemaError):
        st.update_user("alice", password="pw3", old_password="WRONG")
    st.update_user("alice", password="pw3")  # root-credential path
    assert st.authenticate("alice", "pw3").name == "defaultSpaceAdmin"
    with pytest.raises(SchemaError):
        st.authenticate("alice", "pw1")
    assert st.authenticate("root", "secret").allows(Resource.CONFIG, True)
    st.update_user("alice", role_name="defaultDocumentAdmin")
    with pytest.raises(SchemaError):
        st.drop_user("root")
    st.drop_user("alice")
    assert [u["name"] for u in st.list_users()] == ["root"]


def test_authorize_is_the_router_check():
    st = AuthStore()
    st.create_user("reader", "pw", "defaultDocumentAdmin")
    st.authorize("reader", Resource.DOCUMENT, write=True)
    st.authorize("reader", "ResourceIndex", write=False)
    with pytest.raises(SchemaError):
        st.authorize("reader", Resource.SPACE, write=False)
    with pytest.raises(SchemaError):
        st.authorize("ghost", Resource.DOCUMENT, write=False)


def test_rbac_survives_registry_restart(spark, tmp_path):
    """Users/roles live in the rooted catalog like every other master
    record: a fresh Registry.load sees them, authenticates them, and
    enforces the same matrix (the api route-verb shapes throughout)."""
    root = str(tmp_path / "rbac")
    reg = Registry(spark, root=root)
    api.create_role(reg, {"name": "crawler",
                          "privileges": {"ResourceDocument": "WriteOnly"}})
    api.create_user(reg, {"name": "ingest", "password": "pw",
                          "role_name": "crawler"})
    api.change_role_privilege(reg, {
        "name": "crawler", "operator": "Grant",
        "privileges": {"ResourceIndex": "ReadOnly"}})

    reg2 = Registry.load(spark, root)
    assert api.get_user(reg2, "ingest") == {"name": "ingest", "role_name": "crawler"}
    assert api.get_role(reg2, "crawler")["privileges"] == {
        "ResourceDocument": "WriteOnly", "ResourceIndex": "ReadOnly"}
    reg2.auth.authorize("ingest", Resource.DOCUMENT, write=True)
    with pytest.raises(SchemaError):
        reg2.auth.authorize("ingest", Resource.DOCUMENT, write=False)
    assert reg2.auth.authenticate("ingest", "pw").name == "crawler"
    # mutations in the NEW session persist too
    api.update_user(reg2, {"name": "ingest", "role_name": "defaultSpaceAdmin"})
    api.drop_role(reg2, "crawler")
    reg3 = Registry.load(spark, root)
    assert api.get_user(reg3, "ingest")["role_name"] == "defaultSpaceAdmin"
    with pytest.raises(SchemaError):
        api.get_role(reg3, "crawler")
    assert [u["name"] for u in api.list_users(reg3)] == ["ingest", "root"]
    api.drop_user(reg3, "ingest")
    assert [u["name"] for u in api.list_users(Registry.load(spark, root))] == ["root"]


# ------------------------------------------------- credential hardening


def test_passwords_stored_pbkdf2_with_per_user_salt():
    from vearch_spark.auth import AuthStore

    store = AuthStore()
    store.create_user("alice", "hunter2", "defaultDocumentAdmin")
    store.create_user("bob", "hunter2", "defaultDocumentAdmin")
    pa = store._users["alice"]["password"]
    pb = store._users["bob"]["password"]
    assert pa.startswith("pbkdf2_sha256$") and pb.startswith("pbkdf2_sha256$")
    # same cleartext, different salts → different digests
    assert pa != pb
    assert "hunter2" not in pa
    assert store.authenticate("alice", "hunter2").name == "defaultDocumentAdmin"
    with pytest.raises(SchemaError, match="authentication failed"):
        store.authenticate("alice", "wrong")


def test_legacy_sha256_credential_verifies_and_upgrades():
    import hashlib

    from vearch_spark.auth import AuthStore

    store = AuthStore()
    store.create_user("old", "pw", "defaultDocumentAdmin")
    # simulate a pre-r5 catalog record: single-round sha256(name:pw)
    store._users["old"]["password"] = hashlib.sha256(b"old:pw").hexdigest()
    assert store.authenticate("old", "pw") is not None
    # upgraded in place on the successful login
    assert store._users["old"]["password"].startswith("pbkdf2_sha256$")
    with pytest.raises(SchemaError):
        store.authenticate("old", "nope")


def test_update_user_verifies_old_password_constant_time_path():
    from vearch_spark.auth import AuthStore

    store = AuthStore()
    store.create_user("carol", "first", "defaultDocumentAdmin")
    with pytest.raises(SchemaError, match="old password"):
        store.update_user("carol", password="second", old_password="wrong")
    store.update_user("carol", password="second", old_password="first")
    assert store.authenticate("carol", "second") is not None


def test_from_json_missing_root_fails_loudly():
    from vearch_spark.auth import AuthStore

    good = AuthStore()
    good.create_user("dave", "pw", "defaultDocumentAdmin")
    dumped = good.to_json()
    # round-trip with root intact works
    assert AuthStore.from_json(dumped).get_user("dave")["name"] == "dave"
    # a corrupted auth dict that lost root must NOT silently re-seed
    # root with the well-known default credential
    del dumped["users"]["root"]
    with pytest.raises(SchemaError, match="root user missing"):
        AuthStore.from_json(dumped)


def test_api_create_user_requires_name(spark):
    from vearch_spark import api
    from vearch_spark.errors import DocumentError
    from vearch_spark.registry import Registry

    reg = Registry(spark)
    with pytest.raises(DocumentError, match="requires name"):
        api.create_user(reg, {"password": "p", "role_name": "defaultDocumentAdmin"})


def test_legacy_upgrade_login_survives_concurrent_catalog_commit():
    """ADVICE r5: the transparent legacy-hash upgrade persists via
    _notify(), which can hit a ConcurrentWriteError when another
    Registry committed first — that must NOT fail a valid login (a
    read); the next login retries the rewrite."""
    import hashlib

    from vearch_spark.auth import AuthStore
    from vearch_spark.errors import ConcurrentWriteError

    store = AuthStore()
    store.create_user("old", "pw", "defaultDocumentAdmin")
    store._users["old"]["password"] = hashlib.sha256(b"old:pw").hexdigest()

    def conflicted():
        raise ConcurrentWriteError("catalog commit conflict")

    store._on_change = conflicted
    # the login succeeds despite the failed persist...
    assert store.authenticate("old", "pw").name == "defaultDocumentAdmin"
    # ...and the in-memory record is upgraded (durable on next commit)
    assert store._users["old"]["password"].startswith("pbkdf2_sha256$")
    # a WRONG password still fails regardless of the persist path
    with pytest.raises(SchemaError, match="authentication failed"):
        store.authenticate("old", "nope")


def test_require_credentials_round_trips_json():
    from vearch_spark.auth import AuthStore

    store = AuthStore()
    assert store.require_credentials is False  # embedded default
    store.require_credentials = True
    clone = AuthStore.from_json(store.to_json())
    assert clone.require_credentials is True

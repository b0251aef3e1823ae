"""Users / roles / privileges — the master's RBAC surface.

The reference stores users and roles in etcd and checks a
(resource, privilege) matrix on every route (`internal/entity/user.go`,
`internal/master/services/{user,role}_service.go`; exercised by
`test/test_module_user.py` / `test_module_role.py`). The model:

- **Privilege**: None | WriteOnly | ReadOnly | WriteRead
  (user.go:25-41);
- **Resource**: the 13 route resource classes (user.go:43-75);
- **Role**: name → {resource: privilege}, with six BUILTIN roles
  (root, defaultClusterAdmin, defaultSpaceAdmin, defaultDocumentAdmin,
  defaultReadDBSpaceEditDocument, defaultReadSpaceEditDocument —
  user.go:90-156) that are served from the built-in map, never from
  storage (role_service.go:104-106);
- **User**: name + role + password.

Here the same model guards the Registry verbs: an :class:`AuthStore`
holds roles/users (persisted inside the rooted Registry's catalog so
they survive restarts like everything else in etcd), `authorize()` is
the router's privilege check, and validation mirrors the reference —
ValidateName's forbidden characters / leading digit / leading
underscore (user.go:164-196), "root" reserved (can't be a new
user/role name or a user's role), the root user undeletable
(user_service.go:85), non-empty passwords.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from enum import Enum

from vearch_spark.errors import SchemaError


class Privilege(str, Enum):
    """user.go:25-41."""

    NONE = "None"
    WRITE_ONLY = "WriteOnly"
    READ_ONLY = "ReadOnly"
    WRITE_READ = "WriteRead"

    @classmethod
    def parse(cls, s: str) -> "Privilege":
        for p in cls:
            if p.value == s:
                return p
        raise SchemaError(
            f"privilege not supported: {s!r} "
            "(None | WriteOnly | ReadOnly | WriteRead)"
        )

    def grants(self, write: bool) -> bool:
        if self is Privilege.WRITE_READ:
            return True
        if self is Privilege.NONE:
            return False
        return (self is Privilege.WRITE_ONLY) == bool(write)


class Resource(str, Enum):
    """user.go:43-75."""

    ALL = "ResourceAll"
    CLUSTER = "ResourceCluster"
    SERVER = "ResourceServer"
    PARTITION = "ResourcePartition"
    DB = "ResourceDB"
    SPACE = "ResourceSpace"
    DOCUMENT = "ResourceDocument"
    INDEX = "ResourceIndex"
    ALIAS = "ResourceAlias"
    USER = "ResourceUser"
    ROLE = "ResourceRole"
    CONFIG = "ResourceConfig"
    CACHE = "ResourceCache"

    @classmethod
    def parse(cls, s: str) -> "Resource":
        for r in cls:
            if r.value == s:
                return r
        raise SchemaError(f"resource not supported: {s!r}")


# ValidateName's forbidden rune set (user.go:176-181)
_FORBIDDEN = set("\t\n\v\f\r \\+-!*/():^[]\"{}~%&'<>?") | {"\x85", "\xa0"}


def validate_name(name: str, kind: str, check_root: bool = True) -> None:
    """ValidateName (user.go:164-196): non-empty, no leading digit, no
    leading underscore, no forbidden characters; optionally reserve
    'root' (case-insensitive)."""
    if not name:
        raise SchemaError(f"{kind} name can not be empty string")
    if name[0].isdigit():
        raise SchemaError(f"{kind} name : {name} can not start with num")
    if name[0] == "_":
        raise SchemaError(f"{kind} name : {name} can not start with _")
    for ch in name:
        if ch in _FORBIDDEN:
            raise SchemaError(
                f"character {ch!r} can not in {kind} name[{name}]"
            )
    if check_root and name.lower() == "root":
        raise SchemaError(f"{kind} name can't be root")


@dataclass
class Role:
    """user.go:84-88."""

    name: str
    privileges: dict[Resource, Privilege] = field(default_factory=dict)

    def allows(self, resource: Resource | str, write: bool) -> bool:
        resource = Resource.parse(resource) if isinstance(resource, str) else resource
        for res in (Resource.ALL, resource):
            p = self.privileges.get(res)
            if p is not None and p.grants(write):
                return True
        return False

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "privileges": {r.value: p.value for r, p in self.privileges.items()},
        }

    @classmethod
    def from_json(cls, d: dict) -> "Role":
        return cls(
            name=d["name"],
            privileges={
                Resource.parse(r): Privilege.parse(p)
                for r, p in (d.get("privileges") or {}).items()
            },
        )


def _privmap(d: dict[str, str]) -> dict[Resource, Privilege]:
    return {Resource.parse(r): Privilege.parse(p) for r, p in d.items()}


# the six built-ins (user.go:90-156) — served from this map, never
# from storage, exactly like RoleMap in role_service.QueryRole
BUILTIN_ROLES: dict[str, Role] = {
    "root": Role("root", _privmap({"ResourceAll": "WriteRead"})),
    "defaultClusterAdmin": Role("defaultClusterAdmin", _privmap({
        "ResourceCluster": "WriteRead", "ResourceServer": "WriteRead",
        "ResourcePartition": "WriteRead", "ResourceDB": "WriteRead",
        "ResourceSpace": "WriteRead", "ResourceDocument": "WriteRead",
        "ResourceIndex": "WriteRead", "ResourceAlias": "WriteRead",
        "ResourceConfig": "WriteRead", "ResourceUser": "WriteRead",
        "ResourceRole": "WriteRead",
    })),
    "defaultSpaceAdmin": Role("defaultSpaceAdmin", _privmap({
        "ResourceSpace": "WriteRead", "ResourceDocument": "WriteRead",
        "ResourceIndex": "WriteRead", "ResourceAlias": "ReadOnly",
    })),
    "defaultDocumentAdmin": Role("defaultDocumentAdmin", _privmap({
        "ResourceDocument": "WriteRead", "ResourceIndex": "WriteRead",
    })),
    "defaultReadDBSpaceEditDocument": Role("defaultReadDBSpaceEditDocument", _privmap({
        "ResourceCluster": "ReadOnly", "ResourceDB": "ReadOnly",
        "ResourceSpace": "ReadOnly", "ResourceDocument": "WriteRead",
        "ResourceIndex": "WriteRead", "ResourceAlias": "ReadOnly",
    })),
    "defaultReadSpaceEditDocument": Role("defaultReadSpaceEditDocument", _privmap({
        "ResourceSpace": "ReadOnly", "ResourceDocument": "WriteRead",
        "ResourceIndex": "WriteRead", "ResourceAlias": "ReadOnly",
    })),
}

ROOT_NAME = "root"


_PBKDF2_ITERATIONS = 100_000


def _hash_password(name: str, password: str) -> str:
    """Stored credential: PBKDF2-HMAC-SHA256 with a per-user random
    salt (the analog of the reference's etcd-held user record — never
    the cleartext here, and never a fast predictable-salt digest a
    leaked catalog file could be brute-forced against offline)."""
    import os as _os

    salt = _os.urandom(16).hex()
    digest = hashlib.pbkdf2_hmac(
        "sha256",
        f"{name}:{password}".encode(),
        bytes.fromhex(salt),
        _PBKDF2_ITERATIONS,
    ).hex()
    return f"pbkdf2_sha256${_PBKDF2_ITERATIONS}${salt}${digest}"


def _verify_password(name: str, password: str, stored: str) -> bool:
    """Constant-time verification; accepts the legacy single-round
    sha256(name:password) format from pre-r5 catalogs (callers upgrade
    the record on the next successful check)."""
    import hmac as _hmac

    if stored.startswith("pbkdf2_sha256$"):
        try:
            _, iters, salt, digest = stored.split("$")
            cand = hashlib.pbkdf2_hmac(
                "sha256",
                f"{name}:{password}".encode(),
                bytes.fromhex(salt),
                int(iters),
            ).hex()
        except (ValueError, TypeError):
            return False
        return _hmac.compare_digest(cand, digest)
    legacy = hashlib.sha256(f"{name}:{password}".encode()).hexdigest()
    return _hmac.compare_digest(legacy, stored)


class AuthStore:
    """Role + user store with the master's verb surface and rules.

    The root user exists from construction (default password 'secret',
    matching the reference deployment default the module tests
    authenticate with) and cannot be dropped; built-in roles cannot be
    created over, modified, or deleted.
    """

    def __init__(self, root_password: str = "secret"):
        self._roles: dict[str, Role] = {}
        self._users: dict[str, dict] = {
            ROOT_NAME: {
                "name": ROOT_NAME,
                "role": ROOT_NAME,
                "password": _hash_password(ROOT_NAME, root_password),
            }
        }
        # a durability hook: the rooted Registry points this at its
        # catalog save so every auth mutation persists (etcd parity)
        self._on_change = None
        # when True, api verbs reject a bare user NAME and demand
        # (name, password) credentials — the BasicAuthMiddleware posture
        # (doc_http.go:69-131 authenticates before permission-checking).
        # Default False = cooperative identity assertion, the embedded-
        # library deployment where the caller IS the trusted process.
        self.require_credentials = False

    def _notify(self) -> None:
        if self._on_change is not None:
            self._on_change()

    # ---------------------------------------------------------------- roles

    def create_role(self, name: str, privileges: dict[str, str]) -> Role:
        validate_name(name, "Role", check_root=True)
        if name in BUILTIN_ROLES:
            raise SchemaError(f"role {name!r} is a built-in role")
        if name in self._roles:
            raise SchemaError(f"role {name!r} already exists")
        role = Role(name, {
            Resource.parse(r): Privilege.parse(p) for r, p in privileges.items()
        })
        self._roles[name] = role
        self._notify()
        return role

    def get_role(self, name: str) -> Role:
        # built-ins resolve from the map, never storage
        # (role_service.go:104-106)
        if name in BUILTIN_ROLES:
            return BUILTIN_ROLES[name]
        if name not in self._roles:
            raise SchemaError(f"role {name!r} not found")
        return self._roles[name]

    def list_roles(self) -> list[Role]:
        return [self._roles[n] for n in sorted(self._roles)]

    def delete_role(self, name: str) -> None:
        if name in BUILTIN_ROLES:
            raise SchemaError(f"role {name!r} is a built-in role")
        if name not in self._roles:
            raise SchemaError(f"role {name!r} not found")
        if any(u["role"] == name for u in self._users.values()):
            raise SchemaError(f"role {name!r} is still assigned to users")
        del self._roles[name]
        self._notify()

    def change_role_privilege(
        self, name: str, operator: str, privileges: dict[str, str]
    ) -> Role:
        """Grant overwrites per-resource; Revoke removes the resource
        entry (role_service.go:210-222)."""
        if operator not in ("Grant", "Revoke"):
            raise SchemaError(
                f"role privilege operator type : {operator}, "
                "should be Grant or Revoke"
            )
        if name in BUILTIN_ROLES:
            raise SchemaError(f"role {name!r} is a built-in role")
        role = self.get_role(name)
        for r, p in privileges.items():
            res = Resource.parse(r)
            if operator == "Grant":
                role.privileges[res] = Privilege.parse(p)
            else:
                role.privileges.pop(res, None)
        self._notify()
        return role

    # ---------------------------------------------------------------- users

    def create_user(self, name: str, password: str, role_name: str) -> dict:
        validate_name(name, "User", check_root=True)
        if not password:
            raise SchemaError("user password is empty")
        if role_name.lower() == ROOT_NAME:
            # user.go:338-342 — no new user may carry the root role
            raise SchemaError("user role name can't be root")
        self.get_role(role_name)  # must exist (built-in or stored)
        if name in self._users:
            raise SchemaError(f"user {name!r} already exists")
        self._users[name] = {
            "name": name,
            "role": role_name,
            "password": _hash_password(name, password),
        }
        self._notify()
        return self.get_user(name)

    def get_user(self, name: str) -> dict:
        if name not in self._users:
            raise SchemaError(f"user {name!r} not found")
        u = self._users[name]
        # the GET route never echoes the credential
        return {"name": u["name"], "role_name": u["role"]}

    def list_users(self) -> list[dict]:
        return [self.get_user(n) for n in sorted(self._users)]

    def drop_user(self, name: str) -> None:
        if name == ROOT_NAME:
            raise SchemaError("can't delete root user")
        if name not in self._users:
            raise SchemaError(f"user {name!r} not found")
        del self._users[name]
        self._notify()

    def update_user(
        self,
        name: str,
        password: str | None = None,
        old_password: str | None = None,
        role_name: str | None = None,
    ) -> dict:
        """Password change requires the old password unless performed
        by the admin path (old_password omitted — the root-credential
        route, test_module_user.py::test_update_user_password_with_root);
        role change validates the role exists and is not root."""
        if name not in self._users:
            raise SchemaError(f"user {name!r} not found")
        u = self._users[name]
        if password is not None:
            if not password:
                raise SchemaError("user password is empty")
            if old_password is not None and not _verify_password(
                name, old_password, u["password"]
            ):
                raise SchemaError("old password is incorrect")
            u["password"] = _hash_password(name, password)
        if role_name is not None:
            if name == ROOT_NAME or role_name.lower() == ROOT_NAME:
                raise SchemaError("user role name can't be root")
            self.get_role(role_name)
            u["role"] = role_name
        self._notify()
        return self.get_user(name)

    # ---------------------------------------------------------- authz/authn

    def authenticate(self, name: str, password: str) -> Role:
        if name not in self._users or not _verify_password(
            name, password, self._users[name]["password"]
        ):
            raise SchemaError("authentication failed")
        u = self._users[name]
        if not u["password"].startswith("pbkdf2_sha256$"):
            # transparent upgrade of a legacy (pre-PBKDF2) record on
            # the first successful login — the cleartext is in hand
            # exactly here and nowhere else. The catalog rewrite is
            # best-effort: a concurrent commit by another Registry must
            # not turn a VALID login (a read) into a failure — the next
            # login retries the upgrade against the fresh catalog.
            from vearch_spark.errors import ConcurrentWriteError

            u["password"] = _hash_password(name, password)
            try:
                self._notify()
            except ConcurrentWriteError:
                pass
        return self.get_role(u["role"])

    def authorize(self, user_name: str, resource: Resource | str, write: bool) -> None:
        """The router's per-request privilege check: raises unless the
        user's role grants (resource, read|write)."""
        if user_name not in self._users:
            raise SchemaError(f"user {user_name!r} not found")
        role = self.get_role(self._users[user_name]["role"])
        if not role.allows(resource, write):
            res = resource.value if isinstance(resource, Resource) else resource
            raise SchemaError(
                f"user {user_name!r} lacks "
                f"{'write' if write else 'read'} privilege on {res}"
            )

    # ------------------------------------------------------------- persist

    def set_require_credentials(self, enabled: bool) -> None:
        self.require_credentials = bool(enabled)
        self._notify()

    def to_json(self) -> dict:
        return {
            "roles": {n: r.to_json() for n, r in self._roles.items()},
            "users": dict(self._users),
            "require_credentials": self.require_credentials,
        }

    @classmethod
    def from_json(cls, d: dict) -> "AuthStore":
        store = cls.__new__(cls)
        store._roles = {
            n: Role.from_json(r) for n, r in (d.get("roles") or {}).items()
        }
        store._users = dict(d.get("users") or {})
        store._on_change = None  # the owning Registry re-points this
        store.require_credentials = bool(d.get("require_credentials", False))
        if ROOT_NAME not in store._users:
            # a catalog whose auth dict exists but lost its root record
            # is corrupted — silently re-seeding root with the
            # well-known default password would hand anyone the root
            # credential; fail loudly instead (a catalog with NO auth
            # key at all never reaches here: Registry only calls
            # from_json when the key is present)
            raise SchemaError(
                "catalog auth record is corrupted: root user missing — "
                "restore the catalog from backup or delete the 'auth' "
                "key to re-initialize RBAC from scratch"
            )
        return store

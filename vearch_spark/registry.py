"""Database / space / alias registry — the master's metadata surface.

The reference master keeps cluster metadata in etcd: databases
(`internal/entity/db.go`), spaces per db (`internal/entity/space.go`),
and aliases — a name → (db, space) indirection resolved on every
document route (`internal/entity/alias.go`; routes proxied at
`internal/router/document/doc_http.go:237-241`). On Spark there is no
cluster to coordinate, so the registry is a catalog:
create/list/drop databases and spaces, create/update/delete aliases,
and resolve either a real space name or an alias at lookup time —
the same indirection a SQL view gives a table.

Durability (the etcd-persistence analog): construct with ``root`` (or
``Registry.load(spark, root)``) and the catalog persists itself to
``root/_CATALOG.json`` — dbs, space paths, aliases — on every mutation
(atomic tmp+rename, same discipline as the Space manifest). Spaces
created under a rooted registry default to ``root/<db>/<space>`` and
are therefore path-backed; a NEW session's ``Registry.load(root)``
reattaches every space lazily via :meth:`Space.open` (schema/config
from the space's own ``_SPACE.json``), so ``space("db", "alias")`` →
search works across restarts with no client-held schema — the
reference master's restart behavior (`internal/master/services/`,
exercised by `test/test_module_space.py`).

Validation mirrors the master's rules: duplicate db/space/alias names
rejected, dropping a non-empty db rejected (master requires spaces
deleted first), alias must point at an existing space.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from vearch_spark.errors import SchemaError
from vearch_spark.schema import SpaceSchema
from vearch_spark.space import Space

_NAME_RE = re.compile(r"^[A-Za-z0-9_.-]+$")


class Registry:
    """Catalog of databases, spaces, and aliases — in-process by
    default, durable under ``root``."""

    def __init__(self, spark: SparkSession, root: str | None = None):
        from vearch_spark.auth import AuthStore

        self.spark = spark
        self.root = root
        # name -> (Space | None): None = persisted but not yet
        # reattached this session (materialized lazily by space())
        self._dbs: dict[str, dict[str, Space | None]] = {}
        self._paths: dict[tuple[str, str], str] = {}
        self._aliases: dict[str, tuple[str, str]] = {}
        # the master's RBAC surface (users/roles, vearch_spark.auth) —
        # persisted with the catalog under a rooted registry
        self.auth = AuthStore()
        # cluster resource limit (PUT /cluster/resource_limit): while
        # set, document writes on every space reject; reads serve
        self._resource_exhausted = False
        if root:
            os.makedirs(root, exist_ok=True)
            self._load_catalog()
        self.auth._on_change = self._save_catalog

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "Registry":
        """Reattach to a persisted catalog — the new-session entry
        point (`Registry.load(root)` → `space("db","name")` → search)."""
        return cls(spark, root=root)

    # ------------------------------------------------------------- catalog

    def _catalog_path(self) -> str:
        return os.path.join(self.root, "_CATALOG.json")

    def _load_catalog(self) -> None:
        import json as _json

        p = self._catalog_path()
        if not os.path.exists(p):
            return
        with open(p) as fh:
            cat = _json.load(fh)
        for db, spaces in (cat.get("dbs") or {}).items():
            self._dbs[db] = {}
            for name, entry in (spaces or {}).items():
                self._dbs[db][name] = None  # lazy: Space.open on demand
                self._paths[(db, name)] = entry["path"]
        self._aliases = {
            a: (tgt[0], tgt[1]) for a, tgt in (cat.get("aliases") or {}).items()
        }
        if cat.get("auth"):
            from vearch_spark.auth import AuthStore

            self.auth = AuthStore.from_json(cat["auth"])
        self._resource_exhausted = bool(cat.get("resource_exhausted", False))

    def _save_catalog(self) -> None:
        import json as _json

        if not self.root:
            return
        cat = {
            "dbs": {
                db: {
                    name: {"path": self._paths[(db, name)]}
                    for name in sorted(spaces)
                }
                for db, spaces in self._dbs.items()
            },
            "aliases": {a: list(t) for a, t in self._aliases.items()},
            "auth": self.auth.to_json(),
            "resource_exhausted": self._resource_exhausted,
        }
        tmp = self._catalog_path() + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(cat, fh)
        os.replace(tmp, self._catalog_path())

    def _check_name(self, kind: str, name: str) -> None:
        if not name:
            raise SchemaError(f"{kind} name required")
        if self.root and not _NAME_RE.match(name):
            # durable catalogs derive filesystem paths from names —
            # the master likewise rejects names that can't be keys
            raise SchemaError(
                f"{kind} name {name!r} must match [A-Za-z0-9_.-]+"
            )

    # ------------------------------------------------------------ databases

    def create_db(self, name: str) -> None:
        self._check_name("database", name)
        if name in self._dbs:
            raise SchemaError(f"database {name!r} already exists")
        self._dbs[name] = {}
        self._save_catalog()

    def list_dbs(self) -> list[str]:
        return sorted(self._dbs)

    def drop_db(self, name: str) -> None:
        spaces = self._dbs.get(name)
        if spaces is None:
            raise SchemaError(f"database {name!r} not found")
        if spaces:
            # master refuses to drop a db that still holds spaces
            raise SchemaError(
                f"database {name!r} still holds spaces: {sorted(spaces)}"
            )
        del self._dbs[name]
        self._save_catalog()

    # --------------------------------------------------------------- spaces

    def create_space(
        self,
        db: str,
        schema: SpaceSchema,
        path: str | None = None,
        refresh_interval: int = 1000,
        n_buckets: int = 16,
    ) -> Space:
        spaces = self._dbs.get(db)
        if spaces is None:
            raise SchemaError(f"database {db!r} not found")
        if schema.name in spaces:
            raise SchemaError(f"space {schema.name!r} already exists in {db!r}")
        if self.root and path is None:
            # durable by default under a rooted registry
            self._check_name("space", schema.name)
            path = os.path.join(self.root, db, schema.name)
        space = Space(
            self.spark, schema, path=path,
            refresh_interval=refresh_interval, n_buckets=n_buckets,
        )
        space.set_resource_limit(self._resource_exhausted)
        spaces[schema.name] = space
        if path is not None:
            self._paths[(db, schema.name)] = path
        self._save_catalog()
        return space

    def list_spaces(self, db: str) -> list[str]:
        spaces = self._dbs.get(db)
        if spaces is None:
            raise SchemaError(f"database {db!r} not found")
        return sorted(spaces)

    def drop_space(self, db: str, name: str) -> None:
        """Deletes the catalog entry AND, for a space stored under the
        registry root, its data directory — the master deletes the
        space's partitions on DELETE /dbs/{db}/spaces/{space}. A space
        at a caller-supplied path outside the root only leaves the
        catalog (the registry doesn't own that storage)."""
        spaces = self._dbs.get(db)
        if spaces is None or name not in spaces:
            raise SchemaError(f"space {db!r}/{name!r} not found")
        del spaces[name]
        path = self._paths.pop((db, name), None)
        if path and self.root:
            rootp = os.path.realpath(self.root)
            real = os.path.realpath(path)
            if real.startswith(rootp + os.sep):
                import shutil

                shutil.rmtree(real, ignore_errors=True)
        # cascade: aliases pointing at the dropped space die with it
        self._aliases = {
            a: tgt for a, tgt in self._aliases.items() if tgt != (db, name)
        }
        self._save_catalog()

    # -------------------------------------------------------------- aliases

    def create_alias(self, alias: str, db: str, space: str) -> None:
        self._check_name("alias", alias)
        if alias in self._aliases:
            raise SchemaError(f"alias {alias!r} already exists")
        self._check_space_exists(db, space)
        self._aliases[alias] = (db, space)
        self._save_catalog()

    def update_alias(self, alias: str, db: str, space: str) -> None:
        if alias not in self._aliases:
            raise SchemaError(f"alias {alias!r} not found")
        self._check_space_exists(db, space)
        self._aliases[alias] = (db, space)
        self._save_catalog()

    def delete_alias(self, alias: str) -> None:
        if alias not in self._aliases:
            raise SchemaError(f"alias {alias!r} not found")
        del self._aliases[alias]
        self._save_catalog()

    def get_alias(self, alias: str) -> tuple[str, str]:
        if alias not in self._aliases:
            raise SchemaError(f"alias {alias!r} not found")
        return self._aliases[alias]

    def list_aliases(self) -> dict[str, tuple[str, str]]:
        return dict(self._aliases)

    # ------------------------------------------------------------- resolve

    def space(self, db: str, name: str) -> Space:
        """Resolve a space by (db, name); ``name`` may be an alias —
        the per-request indirection the router applies
        (doc_http.go:237-241). The addressed db must EXIST even when an
        alias carries its own (db, space) target — a request routed at
        a never-created database is a client error, not a resolvable
        path (the reference validates the URL db before the alias
        lookup)."""
        spaces = self._dbs.get(db)
        if spaces is None:
            raise SchemaError(f"database {db!r} not found")
        if name in spaces:
            return self._materialize(db, name)
        if name in self._aliases:
            adb, aspace = self._aliases[name]
            self._check_space_exists(adb, aspace)
            return self._materialize(adb, aspace)
        raise SchemaError(f"space {db!r}/{name!r} not found")

    def _check_space_exists(self, db: str, name: str) -> None:
        spaces = self._dbs.get(db)
        if spaces is None or name not in spaces:
            raise SchemaError(f"space {db!r}/{name!r} not found")

    # -------------------------------------------------------------- backup

    def backup_space(
        self,
        db: str,
        name: str,
        backup_path: str,
        command: str = "create",
        version: int | None = None,
    ) -> dict:
        """`POST /backup/dbs/{db}/spaces/{space}` (cluster_api.go:297;
        payload command create|restore, test_module_backup.py):

        - create: snapshot the space (schema + docs, Space.backup) into
          ``{backup_path}/{db}/{name}/v{N}`` — N ALWAYS auto-increments
          (a caller-supplied version is ignored on create: honoring it
          would let a stray ``backup_id`` silently overwrite an
          existing snapshot); returns {"backup_id": N}.
        - restore: recreate the space from version N (default: latest)
          via Space.restore and register it; the space must not
          currently exist (the reference restores after a destroy), and
          a restore is a bulk WRITE — it rejects while the cluster
          resource limit is set, like every other write.

        ``name`` must be a real space name, never an alias: an alias
        resolves to a different storage identity, and restoring under
        one would register a duplicate that shadows the alias forever.
        """
        if name in self._aliases:
            raise SchemaError(
                f"{name!r} is an alias — back up / restore the target "
                f"space {self._aliases[name][1]!r} directly"
            )
        root = os.path.join(backup_path, db, name)
        if command == "create":
            sp = self.space(db, name)
            n = max(self._backup_versions(root), default=0) + 1
            sp.backup(os.path.join(root, f"v{n}"))
            return {"backup_id": n}
        if command == "restore":
            from vearch_spark.errors import DocumentError

            if self._resource_exhausted:
                raise DocumentError(
                    "resource exhausted: restore is a bulk write and is "
                    "rejected until the cluster resource limit clears"
                )
            spaces = self._dbs.get(db)
            if spaces is None:
                raise SchemaError(f"database {db!r} not found")
            if name in spaces:
                raise SchemaError(
                    f"space {db!r}/{name!r} still exists — drop it before restore"
                )
            versions = self._backup_versions(root)
            if not versions:
                raise SchemaError(f"no backup versions under {root!r}")
            n = version if version is not None else max(versions)
            if n not in versions:
                raise SchemaError(f"backup version {n} not found under {root!r}")
            target = None
            if self.root:
                self._check_name("space", name)
                target = os.path.join(self.root, db, name)
            sp = Space.restore(
                self.spark, os.path.join(root, f"v{n}"), target_path=target
            )
            sp.set_resource_limit(self._resource_exhausted)
            spaces[name] = sp
            if target is not None:
                self._paths[(db, name)] = target
            self._save_catalog()
            return {"backup_id": n}
        raise SchemaError(f"backup command not supported: {command!r}")

    def backup_db(self, db: str, backup_path: str, command: str = "create") -> dict:
        """`POST /backup/dbs/{db}` (cluster_api.go:298): the space verb
        across every space in the db. For create that is every LIVE
        space; for restore it is every space with a backup directory
        under ``{backup_path}/{db}`` that is not currently registered —
        iterating live spaces would make a post-destroy db-wide restore
        a silent no-op. Returns per-space backup ids."""
        if command == "restore":
            broot = os.path.join(backup_path, db)
            live = set(self.list_spaces(db))  # validates the db exists
            names = sorted(
                d for d in (
                    os.listdir(broot) if os.path.isdir(broot) else []
                )
                if d not in live and self._backup_versions(os.path.join(broot, d))
            )
        else:
            names = self.list_spaces(db)
        return {
            "spaces": {
                n: self.backup_space(db, n, backup_path, command)["backup_id"]
                for n in names
            }
        }

    def list_backup_versions(self, db: str, name: str, backup_path: str) -> list[int]:
        """`GET /backup/.../versions` listing analog."""
        return self._backup_versions(os.path.join(backup_path, db, name))

    def delete_backup_version(
        self, db: str, name: str, backup_path: str, version: int
    ) -> None:
        """`DELETE /backup/dbs/{db}/spaces/{space}/versions/{v}`
        (cluster_api.go:301)."""
        import shutil

        p = os.path.join(backup_path, db, name, f"v{int(version)}")
        if not os.path.isdir(p):
            raise SchemaError(f"backup version {version} not found")
        shutil.rmtree(p)

    @staticmethod
    def _backup_versions(root: str) -> list[int]:
        if not os.path.isdir(root):
            return []
        return sorted(
            int(d[1:])
            for d in os.listdir(root)
            if d.startswith("v") and d[1:].isdigit()
        )

    def set_resource_limit(self, exhausted: bool) -> None:
        """`PUT /cluster/resource_limit` (the disk-pressure write gate,
        test_module_resource_limit.py): while set, document writes on
        EVERY space reject with a typed error and reads keep serving;
        clearing re-enables. Setting the limit on an empty cluster (no
        spaces anywhere) rejects, like the reference's empty-cluster
        error. Persists with the catalog."""
        exhausted = bool(exhausted)
        if exhausted and not any(self._dbs.get(db) for db in self._dbs):
            raise SchemaError(
                "cannot set resource limit on an empty cluster"
            )
        self._resource_exhausted = exhausted
        for db, spaces in self._dbs.items():
            for name, sp in spaces.items():
                if sp is not None:
                    sp.set_resource_limit(exhausted)
        self._save_catalog()

    def _materialize(self, db: str, name: str) -> Space:
        sp = self._dbs[db][name]
        if sp is None:  # persisted by a previous session — reattach
            sp = Space.open(self.spark, self._paths[(db, name)])
            sp.set_resource_limit(self._resource_exhausted)
            self._dbs[db][name] = sp
        return sp

    # backward-compat internal name used by earlier call sites
    def _check_space(self, db: str, name: str) -> Space:
        self._check_space_exists(db, name)
        return self._materialize(db, name)

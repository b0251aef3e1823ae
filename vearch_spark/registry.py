"""Database / space / alias registry — the master's metadata surface.

The reference master keeps cluster metadata in etcd: databases
(`internal/entity/db.go`), spaces per db (`internal/entity/space.go`),
and aliases — a name → (db, space) indirection resolved on every
document route (`internal/entity/alias.go`; routes proxied at
`internal/router/document/doc_http.go:237-241`). On Spark there is no
cluster to coordinate, so the registry is a plain in-process catalog:
create/list/drop databases and spaces, create/update/delete aliases,
and resolve either a real space name or an alias at lookup time —
the same indirection a SQL view gives a table.

Validation mirrors the master's rules: duplicate db/space/alias names
rejected, dropping a non-empty db rejected (master requires spaces
deleted first), alias must point at an existing space.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from vearch_spark.errors import SchemaError
from vearch_spark.schema import SpaceSchema
from vearch_spark.space import Space


class Registry:
    """In-process catalog of databases, spaces, and aliases."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._dbs: dict[str, dict[str, Space]] = {}
        self._aliases: dict[str, tuple[str, str]] = {}

    # ------------------------------------------------------------ databases

    def create_db(self, name: str) -> None:
        if not name:
            raise SchemaError("database name required")
        if name in self._dbs:
            raise SchemaError(f"database {name!r} already exists")
        self._dbs[name] = {}

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

    # --------------------------------------------------------------- spaces

    def create_space(
        self,
        db: str,
        schema: SpaceSchema,
        path: str | None = None,
        refresh_interval: int = 1000,
    ) -> Space:
        spaces = self._dbs.get(db)
        if spaces is None:
            raise SchemaError(f"database {db!r} not found")
        if schema.name in spaces:
            raise SchemaError(f"space {schema.name!r} already exists in {db!r}")
        space = Space(
            self.spark, schema, path=path, refresh_interval=refresh_interval
        )
        spaces[schema.name] = space
        return space

    def list_spaces(self, db: str) -> list[str]:
        spaces = self._dbs.get(db)
        if spaces is None:
            raise SchemaError(f"database {db!r} not found")
        return sorted(spaces)

    def drop_space(self, db: str, name: str) -> None:
        spaces = self._dbs.get(db)
        if spaces is None or name not in spaces:
            raise SchemaError(f"space {db!r}/{name!r} not found")
        del spaces[name]
        # cascade: aliases pointing at the dropped space die with it
        self._aliases = {
            a: tgt for a, tgt in self._aliases.items() if tgt != (db, name)
        }

    # -------------------------------------------------------------- aliases

    def create_alias(self, alias: str, db: str, space: str) -> None:
        if alias in self._aliases:
            raise SchemaError(f"alias {alias!r} already exists")
        self._check_space(db, space)
        self._aliases[alias] = (db, space)

    def update_alias(self, alias: str, db: str, space: str) -> None:
        if alias not in self._aliases:
            raise SchemaError(f"alias {alias!r} not found")
        self._check_space(db, space)
        self._aliases[alias] = (db, space)

    def delete_alias(self, alias: str) -> None:
        if alias not in self._aliases:
            raise SchemaError(f"alias {alias!r} not found")
        del self._aliases[alias]

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
            return spaces[name]
        if name in self._aliases:
            adb, aspace = self._aliases[name]
            return self._check_space(adb, aspace)
        raise SchemaError(f"space {db!r}/{name!r} not found")

    def _check_space(self, db: str, name: str) -> Space:
        spaces = self._dbs.get(db)
        if spaces is None or name not in spaces:
            raise SchemaError(f"space {db!r}/{name!r} not found")
        return spaces[name]

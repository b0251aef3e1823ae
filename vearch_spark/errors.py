"""Validation errors mirroring the reference's request/schema rejection
surface (vearch router + master), so a user porting from the reference
gets the same *error behavior* even though Spark needs none of the
index machinery that motivated the originals.

Reference citations per error are on the raising call-sites.
"""

from __future__ import annotations


class VearchSparkError(Exception):
    """Base error. ``code`` loosely mirrors vearch's error code names."""

    def __init__(self, message: str, code: str = "PARAM_ERROR"):
        super().__init__(message)
        self.code = code


class SchemaError(VearchSparkError):
    """Invalid space schema (reference: internal/entity/space.go:441-559)."""

    def __init__(self, message: str):
        super().__init__(message, code="SPACE_SCHEMA_ERROR")


class FilterError(VearchSparkError):
    """Invalid filter request (reference: internal/router/document/doc_query.go)."""

    def __init__(self, message: str):
        super().__init__(message, code="FILTER_PARAM_ERROR")


class SearchError(VearchSparkError):
    """Invalid search request (reference: doc_query.go / search_doc.go)."""

    def __init__(self, message: str):
        super().__init__(message, code="SEARCH_PARAM_ERROR")


class DocumentError(VearchSparkError):
    """Invalid document verb request (reference: doc_http.go)."""

    def __init__(self, message: str):
        super().__init__(message, code="DOCUMENT_PARAM_ERROR")


class ConcurrentWriteError(VearchSparkError):
    """A manifest commit lost the optimistic-concurrency race: another
    writer advanced ``_CURRENT`` past the version this commit was based
    on. The reference serializes writes per partition through raft
    (internal/ps/storage/raftstore/); here the CAS rejects the loser
    cleanly instead of silently dropping its bucket updates — re-read
    and retry the operation."""

    def __init__(self, message: str):
        super().__init__(message, code="CONCURRENT_WRITE_ERROR")

"""Error taxonomy — parity with the reference's api/errors.py:5-11 mapping
(NotFoundError→404, ConflictError→409, ValidationError→422).

The engine raises these from service-layer validation; an HTTP facade (or the
test harness) maps them to status codes exactly like the reference app.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine service errors."""

    status_code = 500


class NotFoundError(EngineError):
    """Entity does not exist (reference: api/errors.py:5-6 → 404)."""

    status_code = 404


class ConflictError(EngineError):
    """Optimistic-concurrency (CAS) version mismatch
    (reference: api/errors.py:7-8 → 409)."""

    status_code = 409


class ValidationError(EngineError):
    """Semantic validation failure, e.g. embedding-dim mismatch
    (reference: api/errors.py:9-10 → 422)."""

    status_code = 422

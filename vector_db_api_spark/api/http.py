"""Optional HTTP wrapper over the Facade — the reference's FastAPI surface
(main.py:28-80, api/routers/*) for the Spark engine.

The engine and facade are framework-free by design (dict in → dict out);
this module is the one place FastAPI appears, and it is imported lazily so
the package works in containers without it (this build environment has
none — the module is exercised there via ``create_app``'s clean error and
the facade-level ``health`` test; route wiring mirrors the reference's
router table 1:1 so a FastAPI install turns it on without code changes).

Reference route parity:
- POST   /libraries                         → Facade.create_library
- GET    /libraries/{id}                    → Facade.get_library
- DELETE /libraries/{id}                    → Facade.delete_library
- PATCH  /libraries/{id}/index-config       → Facade.update_index_config
- POST   /libraries/{id}/documents          → Facade.create_document
- POST   /libraries/{id}/documents/with-chunks → Facade.create_document_with_chunks
- GET    /libraries/{id}/documents          → Facade.list_documents
- DELETE /libraries/{id}/documents/{doc}    → Facade.delete_document
- POST   /libraries/{id}/documents/{doc}:move → Facade.move_document
- PATCH  /documents/{id}/metadata           → Facade.update_document_metadata
- GET    /libraries                         → Facade.list_libraries
- POST   /libraries/{id}/rebuild-index      → Facade.rebuild_index
- POST   /libraries/{id}/documents/{doc}/chunks → Facade.upsert_chunk
- DELETE /libraries/{id}/documents/{doc}/chunks/{chunk} → Facade.delete_chunk
- POST   /libraries/{id}/chunks             → Facade.bulk_upsert_chunks
- GET    /libraries/{id}/documents/{doc}    → Facade.get_document (scoped: partition-pruned, wrong-library 404 — routers/documents.py:128)
- GET    /documents/{id}                    → Facade.get_document
- GET    /chunks/{id}                       → Facade.get_chunk
- POST   /libraries/{id}/search             → Facade.search
- GET    /health                            → Facade.health (routers/health.py)
Engine extension (no reference counterpart):
- POST   /libraries/{id}/documents/ingest-text → Facade.ingest_document

Deployment note: one uvicorn worker per driver — the SparkSession is the
engine; horizontal scale comes from the cluster behind it, not from HTTP
replicas, so run this as the thin control-plane head of a long-lived
session (the reference's in-process FastAPI has the same single-process
model, main.py:31-43).
"""

from __future__ import annotations

from typing import Any

from vector_db_api_spark.api.facade import Facade


def _reply(resp: dict, response: Any) -> Any:
    """Map the facade's {"status": code, ...} envelope onto the HTTP reply."""
    response.status_code = resp["status"]
    return resp


def create_app(facade: Facade):
    """Build the FastAPI app over an existing Facade. Raises a clear error
    when FastAPI isn't installed (optional dependency — the engine itself
    never imports it)."""
    try:
        from fastapi import FastAPI, Response
    except ImportError as e:  # pragma: no cover — exercised in bare containers
        raise ImportError(
            "the HTTP surface needs the optional 'fastapi' package; the "
            "engine and Facade work without it — install fastapi+uvicorn "
            "to serve"
        ) from e

    app = FastAPI(title="vector-db-api-spark", version="1.0.0")

    @app.get("/health")
    def health(response: Response):
        return _reply(facade.health(), response)

    @app.post("/libraries")
    def create_library(body: dict, response: Response):
        return _reply(facade.create_library(body), response)

    @app.get("/libraries/{library_id}")
    def get_library(library_id: str, response: Response):
        return _reply(facade.get_library(library_id), response)

    @app.post("/libraries/{library_id}/documents")
    def create_document(library_id: str, body: dict, response: Response):
        return _reply(facade.create_document(library_id, body), response)

    @app.get("/libraries/{library_id}/documents")
    def list_documents(
        library_id: str,
        response: Response,
        offset: int = 0,
        limit: int = 50,
        has_tag: str | None = None,
    ):
        return _reply(
            facade.list_documents(
                library_id, offset=offset, limit=limit, has_tag=has_tag
            ),
            response,
        )

    @app.get("/libraries")
    def list_libraries(response: Response, offset: int = 0, limit: int = 50):
        return _reply(facade.list_libraries(offset=offset, limit=limit), response)

    @app.post("/libraries/{library_id}/rebuild-index")
    def rebuild_index(library_id: str, response: Response):
        return _reply(facade.rebuild_index(library_id), response)

    @app.post("/libraries/{library_id}/documents/{document_id}/chunks")
    def upsert_chunk(
        library_id: str, document_id: str, body: dict, response: Response
    ):
        return _reply(facade.upsert_chunk(library_id, document_id, body), response)

    @app.delete(
        "/libraries/{library_id}/documents/{document_id}/chunks/{chunk_id}"
    )
    def delete_chunk(
        library_id: str, document_id: str, chunk_id: str, response: Response
    ):
        return _reply(
            facade.delete_chunk(library_id, document_id, chunk_id), response
        )

    @app.post("/libraries/{library_id}/chunks")
    def bulk_upsert_chunks(library_id: str, body: list[dict], response: Response):
        return _reply(facade.bulk_upsert_chunks(library_id, body), response)

    @app.get("/libraries/{library_id}/documents/{document_id}")
    def get_document_in_library(
        library_id: str, document_id: str, response: Response
    ):
        # the reference's nested route shape (routers/documents.py:128) —
        # partition-pruned; wrong-library doc 404s
        return _reply(facade.get_document(document_id, library_id), response)

    @app.get("/documents/{document_id}")
    def get_document(document_id: str, response: Response):
        return _reply(facade.get_document(document_id), response)

    @app.get("/chunks/{chunk_id}")
    def get_chunk(chunk_id: str, response: Response):
        return _reply(facade.get_chunk(chunk_id), response)

    @app.post("/libraries/{library_id}/search")
    def search(library_id: str, body: dict, response: Response):
        return _reply(facade.search(library_id, body), response)

    @app.delete("/libraries/{library_id}")
    def delete_library(library_id: str, response: Response):
        return _reply(facade.delete_library(library_id), response)

    @app.delete("/libraries/{library_id}/documents/{document_id}")
    def delete_document(library_id: str, document_id: str, response: Response):
        return _reply(facade.delete_document(library_id, document_id), response)

    @app.post("/libraries/{library_id}/documents/{document_id}:move")
    def move_document(
        library_id: str, document_id: str, body: dict, response: Response
    ):
        return _reply(facade.move_document(library_id, document_id, body), response)

    @app.patch("/libraries/{library_id}/index-config")
    def update_index_config(library_id: str, body: dict, response: Response):
        return _reply(facade.update_index_config(library_id, body), response)

    @app.post("/libraries/{library_id}/documents/with-chunks")
    def create_document_with_chunks(
        library_id: str, body: dict, response: Response
    ):
        return _reply(
            facade.create_document_with_chunks(library_id, body), response
        )

    @app.patch("/documents/{document_id}/metadata")
    def update_document_metadata(document_id: str, body: dict, response: Response):
        return _reply(facade.update_document_metadata(document_id, body), response)

    @app.post("/libraries/{library_id}/documents/ingest-text")
    def ingest_document(library_id: str, body: dict, response: Response):
        return _reply(facade.ingest_document(library_id, body), response)

    return app

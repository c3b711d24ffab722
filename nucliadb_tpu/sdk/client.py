"""Typed HTTP client for the nucliadb_tpu API."""

from __future__ import annotations

from typing import Optional

import httpx

from ..models.api import (
    AskRequest,
    AskResponse,
    CatalogRequest,
    CatalogResponse,
    CreateResourcePayload,
    FindRequest,
    GraphSearchPayload,
    GraphSearchResponse,
    KnowledgeBoxConfig,
    KnowledgeBoxObj,
    KnowledgeboxFindResults,
    ResourceCreated,
    SuggestRequest,
    SuggestResponse,
    UpdateResourcePayload,
    VectorSetSpec,
)


class NucliaDBClient:
    def __init__(self, base_url: str = "http://127.0.0.1:8080", timeout: float = 60.0):
        self._client = httpx.Client(base_url=base_url, timeout=timeout)

    def close(self) -> None:
        self._client.close()

    def _raise(self, resp: httpx.Response) -> None:
        if resp.status_code >= 400:
            raise httpx.HTTPStatusError(
                f"{resp.status_code}: {resp.text}", request=resp.request, response=resp
            )

    # ---- knowledge boxes -------------------------------------------------

    def create_kb(self, config: KnowledgeBoxConfig) -> KnowledgeBoxObj:
        resp = self._client.post("/api/v1/kbs", json=config.model_dump())
        self._raise(resp)
        return KnowledgeBoxObj.model_validate(resp.json())

    def list_kbs(self) -> list[str]:
        resp = self._client.get("/api/v1/kbs")
        self._raise(resp)
        return resp.json()["kbs"]

    def get_kb(self, kbid: str) -> KnowledgeBoxObj:
        resp = self._client.get(f"/api/v1/kb/{kbid}")
        self._raise(resp)
        return KnowledgeBoxObj.model_validate(resp.json())

    def get_kb_by_slug(self, slug: str) -> KnowledgeBoxObj:
        resp = self._client.get(f"/api/v1/kb/s/{slug}")
        self._raise(resp)
        return KnowledgeBoxObj.model_validate(resp.json())

    def delete_kb(self, kbid: str) -> None:
        self._raise(self._client.delete(f"/api/v1/kb/{kbid}"))

    def add_vectorset(self, kbid: str, name: str, spec: VectorSetSpec) -> None:
        self._raise(
            self._client.post(
                f"/api/v1/kb/{kbid}/vectorsets/{name}", json=spec.model_dump()
            )
        )

    # ---- resources ---------------------------------------------------------

    def create_resource(self, kbid: str, payload: CreateResourcePayload) -> ResourceCreated:
        resp = self._client.post(
            f"/api/v1/kb/{kbid}/resources", json=payload.model_dump()
        )
        self._raise(resp)
        return ResourceCreated.model_validate(resp.json())

    def get_resource(self, kbid: str, rid: str) -> dict:
        resp = self._client.get(f"/api/v1/kb/{kbid}/resource/{rid}")
        self._raise(resp)
        return resp.json()

    def update_resource(self, kbid: str, rid: str, payload: UpdateResourcePayload) -> None:
        self._raise(
            self._client.patch(
                f"/api/v1/kb/{kbid}/resource/{rid}",
                json=payload.model_dump(exclude_unset=True),
            )
        )

    def delete_resource(self, kbid: str, rid: str) -> None:
        self._raise(self._client.delete(f"/api/v1/kb/{kbid}/resource/{rid}"))

    # ---- search ---------------------------------------------------------------

    def find(self, kbid: str, request: FindRequest) -> KnowledgeboxFindResults:
        resp = self._client.post(
            f"/api/v1/kb/{kbid}/find", json=request.model_dump(exclude_none=True)
        )
        self._raise(resp)
        return KnowledgeboxFindResults.model_validate(resp.json())

    def suggest(self, kbid: str, request: SuggestRequest) -> SuggestResponse:
        resp = self._client.post(
            f"/api/v1/kb/{kbid}/suggest", json=request.model_dump()
        )
        self._raise(resp)
        return SuggestResponse.model_validate(resp.json())

    def catalog(self, kbid: str, request: CatalogRequest) -> CatalogResponse:
        resp = self._client.post(
            f"/api/v1/kb/{kbid}/catalog", json=request.model_dump(exclude_none=True)
        )
        self._raise(resp)
        return CatalogResponse.model_validate(resp.json())

    def graph(self, kbid: str, request: GraphSearchPayload) -> GraphSearchResponse:
        resp = self._client.post(
            f"/api/v1/kb/{kbid}/graph", json=request.model_dump(exclude_none=True)
        )
        self._raise(resp)
        return GraphSearchResponse.model_validate(resp.json())

    def ask(self, kbid: str, request: AskRequest) -> AskResponse:
        resp = self._client.post(
            f"/api/v1/kb/{kbid}/ask", json=request.model_dump(exclude_none=True)
        )
        self._raise(resp)
        return AskResponse.model_validate(resp.json())

    # ---- resources by slug ------------------------------------------------

    def get_resource_by_slug(self, kbid: str, slug: str) -> dict:
        resp = self._client.get(f"/api/v1/kb/{kbid}/slug/{slug}")
        self._raise(resp)
        return resp.json()

    # ---- files (parity: nucliadb_sdk upload helpers) -----------------------

    def upload_file(
        self, kbid: str, rid: str, field: str, data: bytes,
        *, filename: str = "", content_type: str = "application/octet-stream",
    ) -> dict:
        resp = self._client.post(
            f"/api/v1/kb/{kbid}/resource/{rid}/file/{field}/upload",
            params={"filename": filename or field},
            content=data,
            headers={"content-type": content_type},
        )
        self._raise(resp)
        return resp.json()

    def tus_upload(
        self, kbid: str, rid: str, field: str, data: bytes,
        *, filename: str = "", content_type: str = "application/octet-stream",
        chunk_size: int = 4 * 1024 * 1024,
    ) -> None:
        """Resumable upload: TUS creation + offset-checked PATCH loop. On a
        connection error, re-HEADs the committed offset and resumes."""
        import base64

        meta = []
        if filename:
            meta.append("filename " + base64.b64encode(filename.encode()).decode())
        if content_type:
            meta.append(
                "content_type " + base64.b64encode(content_type.encode()).decode()
            )
        resp = self._client.post(
            f"/api/v1/kb/{kbid}/resource/{rid}/file/{field}/tusupload",
            headers={
                "tus-resumable": "1.0.0",
                "upload-length": str(len(data)),
                "upload-metadata": ",".join(meta),
            },
        )
        self._raise(resp)
        location = resp.headers["location"]
        offset = 0
        while offset < len(data):
            chunk = data[offset : offset + chunk_size]
            try:
                resp = self._client.patch(
                    location,
                    content=chunk,
                    headers={
                        "tus-resumable": "1.0.0",
                        "upload-offset": str(offset),
                        "content-type": "application/offset+octet-stream",
                    },
                )
                self._raise(resp)
                offset = int(resp.headers["upload-offset"])
            except (httpx.TransportError,):
                head = self._client.request("HEAD", location)
                self._raise(head)
                offset = int(head.headers["upload-offset"])

    def download_file(self, kbid: str, rid: str, field: str) -> bytes:
        resp = self._client.get(
            f"/api/v1/kb/{kbid}/resource/{rid}/file/{field}/download"
        )
        self._raise(resp)
        return resp.content

    # ---- notifications ------------------------------------------------------

    def notifications(self, kbid: str, since: int = 0, limit: int = 100) -> list[dict]:
        resp = self._client.get(
            f"/api/v1/kb/{kbid}/notifications",
            params={"since": since, "limit": limit},
        )
        self._raise(resp)
        return resp.json()["notifications"]

    def notifications_stream(self, kbid: str, timeout: float = 30.0):
        """Yields live notification events from the SSE endpoint."""
        import json as _json

        with self._client.stream(
            "GET",
            f"/api/v1/kb/{kbid}/notifications",
            params={"timeout": timeout},
            headers={"accept": "text/event-stream"},
        ) as resp:
            if resp.status_code >= 400:
                resp.read()
                self._raise(resp)
            for line in resp.iter_lines():
                if line.startswith("data: "):
                    yield _json.loads(line[len("data: "):])

    # ---- vocabulary services -----------------------------------------------

    def set_labelset(self, kbid: str, labelset: str, payload: dict) -> None:
        self._raise(
            self._client.post(f"/api/v1/kb/{kbid}/labelset/{labelset}", json=payload)
        )

    def get_labelsets(self, kbid: str) -> dict:
        resp = self._client.get(f"/api/v1/kb/{kbid}/labelsets")
        self._raise(resp)
        return resp.json()["labelsets"]

    def set_entities_group(self, kbid: str, group: str, payload: dict) -> None:
        self._raise(
            self._client.post(f"/api/v1/kb/{kbid}/entitiesgroup/{group}", json=payload)
        )

    def set_synonyms(self, kbid: str, synonyms: dict) -> None:
        self._raise(
            self._client.post(f"/api/v1/kb/{kbid}/custom-synonyms", json=synonyms)
        )

    # ---- export / import / backups ------------------------------------------

    def export_kb(self, kbid: str) -> bytes:
        resp = self._client.get(f"/api/v1/kb/{kbid}/export")
        self._raise(resp)
        return resp.content

    def import_kb(self, blob: bytes, slug: str = "") -> str:
        resp = self._client.post(
            "/api/v1/kbs/import", params={"slug": slug} if slug else {}, content=blob
        )
        self._raise(resp)
        return resp.json()["uuid"]

    def backup_kb(self, kbid: str) -> str:
        resp = self._client.post(f"/api/v1/kb/{kbid}/backup")
        self._raise(resp)
        return resp.json()["backup_id"]

    # ---- misc -----------------------------------------------------------------

    def openapi(self) -> dict:
        resp = self._client.get("/api/v1/openapi.json")
        self._raise(resp)
        return resp.json()

    def ask_stream(self, kbid: str, request: AskRequest):
        """Yields AskResponseItem dicts from the ndjson stream."""
        import json as _json

        with self._client.stream(
            "POST",
            f"/api/v1/kb/{kbid}/ask",
            params={"stream": "ndjson"},
            json=request.model_dump(exclude_none=True),
        ) as resp:
            if resp.status_code >= 400:
                resp.read()
                self._raise(resp)
            for line in resp.iter_lines():
                if line.strip():
                    yield _json.loads(line)["item"]

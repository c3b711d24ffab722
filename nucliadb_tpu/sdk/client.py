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

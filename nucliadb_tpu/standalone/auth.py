"""Standalone auth policies.

Parity: reference standalone/auth.py — the standalone server trusts an
upstream proxy to authenticate and forwards identity/roles via headers
(UPSTREAM_NAIVE), or runs without auth (the reference's default local mode).
An `api_key` policy adds self-contained static bearer tokens mapped to
roles. Roles mirror NucliaDBRoles: READER / WRITER / MANAGER.

Route classification: search/read surfaces need READER, content writes need
WRITER, KB lifecycle + admin need MANAGER (reference writer/reader/search
api `requires_one` annotations).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..http import HTTPError, Request

READER = "READER"
WRITER = "WRITER"
MANAGER = "MANAGER"

import re as _re

# POST endpoints that are reads (retrieval surfaces). ANCHORED patterns —
# matching on a path suffix would let a client forge READER access by
# naming an object 'ask'/'find' (e.g. POST /labelset/ask).
_READER_POST_RE = _re.compile(
    r"^/api/v1/kb/[^/]+/"
    r"(find|search|suggest|catalog(/facets)?|graph(/nodes|/relations)?|ask"
    r"|summarize|hydrate|augment|feedback|retrieve|predict/[^/]+)$"
)

# management-only read surfaces: KB enumeration, full-data exports, backups,
# admin introspection
_MANAGER_GET_RE = _re.compile(
    r"^(/api/v1/kbs$|/api/v1/admin|/api/v1/backups"
    r"|/api/v1/kb/[^/]+/export(/|$))"
)


@dataclass
class AuthSettings:
    policy: str = "insecure"  # insecure | upstream_naive | api_key
    roles_header: str = "x-nucliadb-roles"
    user_header: str = "x-nucliadb-user"
    # api_key policy: token -> roles
    api_keys: dict[str, list[str]] = field(default_factory=dict)


def required_role(method: str, path: str) -> Optional[str]:
    """Role needed for a route; None = open (health, metrics, docs)."""
    if (
        path in ("/", "/metrics", "/api/v1/openapi.json")
        or path.startswith("/health")
    ):
        return None
    if method in ("GET", "HEAD", "OPTIONS"):
        return MANAGER if _MANAGER_GET_RE.match(path) else READER
    if method == "POST" and _READER_POST_RE.match(path):
        return READER
    # KB lifecycle + admin + import/backup restore are management surface
    if path == "/api/v1/kbs" or path.startswith(
        ("/api/v1/admin", "/api/v1/kbs/import", "/api/v1/backups")
    ):
        return MANAGER
    if method == "DELETE" and path.count("/") == 4 and path.startswith("/api/v1/kb/"):
        return MANAGER  # DELETE /api/v1/kb/{kbid}
    return WRITER


def _roles_for(settings: AuthSettings, request: Request) -> Optional[list[str]]:
    """None = unauthenticated."""
    if settings.policy == "insecure":
        return [READER, WRITER, MANAGER]
    if settings.policy == "upstream_naive":
        raw = request.headers.get(settings.roles_header)
        if raw is None or settings.user_header not in request.headers:
            return None
        return [r.strip().upper() for r in raw.split(";") if r.strip()]
    if settings.policy == "api_key":
        auth = request.headers.get("authorization", "")
        token = auth[7:] if auth.lower().startswith("bearer ") else (
            request.headers.get("x-nuclia-nuakey") or ""
        )
        roles = settings.api_keys.get(token)
        return list(roles) if roles is not None else None
    raise ValueError(f"unknown auth policy {settings.policy!r}")


def make_auth_hook(settings: AuthSettings):
    """Returns a callable(request) raising 401/403, or None when open."""
    if settings.policy == "insecure":
        return None

    def hook(request: Request) -> None:
        need = required_role(request.method, request.path)
        if need is None:
            return
        roles = _roles_for(settings, request)
        if roles is None:
            raise HTTPError(401, "missing or invalid credentials")
        if need not in roles and MANAGER not in roles:
            raise HTTPError(403, f"requires role {need}")

    return hook

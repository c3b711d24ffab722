"""HTTP client SDK.

Parity with the reference's nucliadb_sdk package: a thin typed client over
the v1 REST API (httpx), returning the same pydantic models the server
uses.
"""

from .client import NucliaDBClient

__all__ = ["NucliaDBClient"]

"""In-process protocol fakes for the cloud storage backends.

Each fake implements just enough of the provider's REST surface to exercise
the client: object CRUD, paginated listing (page size 2 to force multiple
round trips), and authentication checks. Signatures are verified with
implementations written independently of the client code (same public
spec), so a canonicalization bug on either side fails the handshake.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, unquote, urlparse

PAGE = 2  # tiny pages force pagination in list()


class _FakeBase(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # quiet
        pass

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def _send(self, status: int, body: bytes = b"", content_type: str = "application/xml",
              headers: dict | None = None):
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if self.command != "HEAD" and body:
            self.wfile.write(body)


def _serve(handler_cls) -> tuple[ThreadingHTTPServer, str]:
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.server_port}"


# ---------------------------------------------------------------------------
# S3
# ---------------------------------------------------------------------------


def _s3_expected_signature(
    method: str, path: str, query: dict[str, str], headers,
    payload_hash: str, amz_date: str, scope: str, secret_key: str,
) -> str:
    """Independent SigV4 per the AWS docs (NOT the client implementation)."""

    def enc(s, slash=False):
        return quote(s, safe="-._~/" if slash else "-._~")

    auth = headers["Authorization"]
    signed_headers = re.search(r"SignedHeaders=([^,]+)", auth).group(1)
    canon_headers = ""
    for name in signed_headers.split(";"):
        canon_headers += f"{name}:{headers.get(name, '').strip()}\n"
    canon_query = "&".join(
        f"{enc(k)}={enc(v)}" for k, v in sorted(query.items())
    )
    creq = "\n".join(
        [method, enc(path, slash=True), canon_query, canon_headers,
         signed_headers, payload_hash]
    )
    sts = "\n".join(
        ["AWS4-HMAC-SHA256", amz_date, scope,
         hashlib.sha256(creq.encode()).hexdigest()]
    )
    date_stamp, region, service, _ = scope.split("/")
    key = ("AWS4" + secret_key).encode()
    for part in (date_stamp, region, service, "aws4_request"):
        key = hmac.new(key, part.encode(), hashlib.sha256).digest()
    return hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()


def make_fake_s3(bucket: str, access_key: str, secret_key: str):
    blobs: dict[str, bytes] = {}

    class FakeS3(_FakeBase):
        def _check_auth(self, body: bytes) -> bool:
            auth = self.headers.get("Authorization", "")
            m = re.search(r"Credential=([^/]+)/([^,]+)", auth)
            if not m or m.group(1) != access_key:
                return False
            scope = m.group(2)
            payload_hash = self.headers.get("x-amz-content-sha256", "")
            if hashlib.sha256(body).hexdigest() != payload_hash:
                return False
            parsed = urlparse(self.path)
            query = {k: v[0] for k, v in parse_qs(parsed.query, keep_blank_values=True).items()}
            got = re.search(r"Signature=([0-9a-f]+)", auth).group(1)
            want = _s3_expected_signature(
                self.command, unquote(parsed.path), query, self.headers,
                payload_hash, self.headers.get("x-amz-date", ""), scope,
                secret_key,
            )
            return hmac.compare_digest(got, want)

        def _route(self):
            body = self._body()
            if not self._check_auth(body):
                return self._send(403, b"<Error>SignatureDoesNotMatch</Error>")
            parsed = urlparse(self.path)
            query = {k: v[0] for k, v in parse_qs(parsed.query, keep_blank_values=True).items()}
            path = unquote(parsed.path)
            assert path.startswith(f"/{bucket}")
            key = path[len(bucket) + 2 :]
            if self.command == "PUT":
                blobs[key] = body
                return self._send(200)
            if self.command == "DELETE":
                blobs.pop(key, None)
                return self._send(204)
            if self.command == "HEAD":
                return self._send(200 if key in blobs else 404)
            if self.command == "GET" and key:
                if key not in blobs:
                    return self._send(404, b"<Error>NoSuchKey</Error>")
                return self._send(200, blobs[key], "application/octet-stream")
            # ListObjectsV2
            prefix = query.get("prefix", "")
            start = query.get("continuation-token", "")
            keys = sorted(k for k in blobs if k.startswith(prefix) and k > start)
            page, rest = keys[:PAGE], keys[PAGE:]
            xml = "<ListBucketResult>"
            xml += "".join(f"<Key>{k}</Key>" for k in page)
            if rest:
                xml += "<IsTruncated>true</IsTruncated>"
                xml += f"<NextContinuationToken>{page[-1]}</NextContinuationToken>"
            else:
                xml += "<IsTruncated>false</IsTruncated>"
            xml += "</ListBucketResult>"
            return self._send(200, xml.encode())

        do_GET = do_PUT = do_DELETE = do_HEAD = _route

    return _serve(FakeS3) + (blobs,)


# ---------------------------------------------------------------------------
# GCS
# ---------------------------------------------------------------------------


def make_fake_gcs(bucket: str, token: str):
    blobs: dict[str, bytes] = {}

    class FakeGCS(_FakeBase):
        def _route(self):
            body = self._body()
            if self.headers.get("Authorization") != f"Bearer {token}":
                return self._send(401, b'{"error": "unauthorized"}', "application/json")
            parsed = urlparse(self.path)
            query = {k: v[0] for k, v in parse_qs(parsed.query, keep_blank_values=True).items()}
            path = unquote(parsed.path)
            if self.command == "POST" and path == f"/upload/storage/v1/b/{bucket}/o":
                blobs[query["name"]] = body
                return self._send(200, b"{}", "application/json")
            assert path.startswith(f"/storage/v1/b/{bucket}/o")
            key = unquote(path[len(f"/storage/v1/b/{bucket}/o") :].lstrip("/"))
            if self.command == "DELETE":
                blobs.pop(key, None)
                return self._send(204)
            if key:  # object get / metadata
                if key not in blobs:
                    return self._send(404, b"{}", "application/json")
                if query.get("alt") == "media":
                    return self._send(200, blobs[key], "application/octet-stream")
                return self._send(200, b'{"kind": "storage#object"}', "application/json")
            # list
            prefix = query.get("prefix", "")
            start = query.get("pageToken", "")
            keys = sorted(k for k in blobs if k.startswith(prefix) and k > start)
            page, rest = keys[:PAGE], keys[PAGE:]
            out = {"items": [{"name": k} for k in page]}
            if rest:
                out["nextPageToken"] = page[-1]
            return self._send(200, json.dumps(out).encode(), "application/json")

        do_GET = do_POST = do_DELETE = _route

    return _serve(FakeGCS) + (blobs,)


# ---------------------------------------------------------------------------
# Azure Blob
# ---------------------------------------------------------------------------


def _azure_expected_signature(
    method: str, account: str, path: str, query: dict, headers, body: bytes,
    account_key: str,
) -> str:
    """Independent SharedKey string-to-sign per the Azure docs."""
    ms = sorted(
        (k.lower(), v.strip()) for k, v in headers.items()
        if k.lower().startswith("x-ms-")
    )
    canon_headers = "".join(f"{k}:{v}\n" for k, v in ms)
    canon_res = f"/{account}{path}"
    for k in sorted(query):
        canon_res += f"\n{k.lower()}:{query[k]}"
    sts = "\n".join(
        [method, "", "", str(len(body)) if body else "", "",
         headers.get("Content-Type", ""), "", "", "", "", "", "",
         canon_headers + canon_res]
    )
    return base64.b64encode(
        hmac.new(base64.b64decode(account_key), sts.encode(), hashlib.sha256).digest()
    ).decode()


def make_fake_azure(account: str, account_key: str, container: str):
    blobs: dict[str, bytes] = {}

    class FakeAzure(_FakeBase):
        def _route(self):
            body = self._body()
            parsed = urlparse(self.path)
            query = {k: v[0] for k, v in parse_qs(parsed.query, keep_blank_values=True).items()}
            path = unquote(parsed.path)
            # SharedKey CanonicalizedResource uses the ENCODED URI path
            # exactly as sent (Azure docs) — unquoting before verification
            # would accept clients that sign the raw path (real Azure 403s)
            want = _azure_expected_signature(
                self.command, account, parsed.path, query, self.headers, body,
                account_key,
            )
            auth = self.headers.get("Authorization", "")
            if auth != f"SharedKey {account}:{want}":
                return self._send(403, b"<Error>AuthenticationFailed</Error>")
            assert path.startswith(f"/{container}")
            key = path[len(container) + 2 :]
            if self.command == "PUT":
                assert self.headers.get("x-ms-blob-type") == "BlockBlob"
                blobs[key] = body
                return self._send(201)
            if self.command == "DELETE":
                blobs.pop(key, None)
                return self._send(202)
            if self.command == "HEAD":
                return self._send(200 if key in blobs else 404)
            if key:
                if key not in blobs:
                    return self._send(404)
                return self._send(200, blobs[key], "application/octet-stream")
            # list blobs
            prefix = query.get("prefix", "")
            start = query.get("marker", "")
            keys = sorted(k for k in blobs if k.startswith(prefix) and k > start)
            page, rest = keys[:PAGE], keys[PAGE:]
            xml = "<EnumerationResults><Blobs>"
            xml += "".join(f"<Blob><Name>{k}</Name></Blob>" for k in page)
            xml += "</Blobs>"
            xml += f"<NextMarker>{page[-1] if rest else ''}</NextMarker>"
            xml += "</EnumerationResults>"
            return self._send(200, xml.encode())

        do_GET = do_PUT = do_DELETE = do_HEAD = _route

    return _serve(FakeAzure) + (blobs,)

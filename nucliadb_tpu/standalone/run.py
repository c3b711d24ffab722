"""Standalone entrypoint: ``python -m nucliadb_tpu.standalone.run``.

Parity: the reference's ``nucliadb`` binary (standalone/run.py:84-147).
"""

from __future__ import annotations

import argparse
import asyncio

from .app import StandaloneApp


def main() -> None:
    parser = argparse.ArgumentParser(description="nucliadb_tpu standalone server")
    parser.add_argument("--data-dir", default="./data")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--bg-interval", type=float, default=15.0)
    parser.add_argument(
        "--auth-policy", default="insecure",
        choices=["insecure", "upstream_naive", "api_key"],
        help="auth mode (parity: reference auth_policy settings)",
    )
    parser.add_argument(
        "--api-key", action="append", default=[],
        metavar="TOKEN=ROLE1;ROLE2",
        help="api_key policy: static token to roles (repeatable)",
    )
    parser.add_argument(
        "--local-predict", action="store_true",
        help="enable the in-process hashing predict engine (query embedding "
        "without an external model — useful for demos/tests)",
    )
    args = parser.parse_args()

    import os as _os

    if any(
        _os.environ.get(k)
        for k in ("NDBTPU_TELEMETRY__TRACING", "NDBTPU_TELEMETRY__CONSOLE_TRACES",
                  "NDBTPU_TELEMETRY__OTLP")
    ):
        from ..telemetry.tracing import setup_tracing

        setup_tracing()


    from .auth import AuthSettings

    api_keys = {}
    for entry in args.api_key:
        token, _, roles = entry.partition("=")
        api_keys[token] = [
            role.strip().upper() for role in roles.split(";") if role.strip()
        ]
    auth = AuthSettings(policy=args.auth_policy, api_keys=api_keys)
    predict = None
    if args.local_predict:
        from ..search.predict import LocalPredictEngine

        predict = LocalPredictEngine()

    app = StandaloneApp(
        data_dir=args.data_dir, host=args.host, port=args.port,
        auth=auth, predict=predict,
    )
    app.start_background(args.bg_interval)
    print(f"nucliadb_tpu standalone listening on http://{args.host}:{args.port}")
    try:
        asyncio.run(app.server.serve_forever())
    except KeyboardInterrupt:
        pass
    finally:
        app.stop_background()


if __name__ == "__main__":
    main()

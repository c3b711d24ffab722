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
    args = parser.parse_args()

    app = StandaloneApp(data_dir=args.data_dir, host=args.host, port=args.port)
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

"""``mmt exec-service``: sandboxed code-execution HTTP service.

Parity with the reference's ``PyExecService`` Ray Serve deployment
(``cli/debug.py:9-44`` — whose handler returns ``{"not": "implemented"}``)
— except this one is implemented: POST /execute {"code": ...} runs the
payload inside the first-party C++ jail (``native/sandbox``) and returns
stdout/stderr/returncode. Used for RL-time code-execution rewards.
"""

from __future__ import annotations

import json
import logging
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import click

from multimeditron_tpu.cli import EPILOG, main_cli

logger = logging.getLogger(__name__)


def make_handler(executor):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/execute":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
                result = executor.run_code(payload.get("code", ""))
                body = json.dumps(
                    {
                        "stdout": result.stdout,
                        "stderr": result.stderr,
                        "returncode": result.returncode,
                        "timed_out": result.timed_out,
                    }
                ).encode()
                self.send_response(200)
            except Exception as e:  # noqa: BLE001
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

    return Handler


def make_server(host: str, port: int, timeout: int = 10, mem_mb: int = 512):
    from multimeditron_tpu.rlhf.sandbox import SandboxExecutor

    executor = SandboxExecutor(timeout_sec=timeout, mem_mb=mem_mb)
    return ThreadingHTTPServer((host, port), make_handler(executor))


@main_cli.command("exec-service", epilog=EPILOG)
@click.option("--host", default="127.0.0.1")
@click.option("--port", default=8266)
@click.option("--timeout", default=10, help="Per-request wall-clock limit (s)")
@click.option("--mem-mb", default=512)
def exec_service(host, port, timeout, mem_mb):
    server = make_server(host, port, timeout, mem_mb)
    click.echo(f"exec-service listening on {host}:{port} (POST /execute)")
    server.serve_forever()

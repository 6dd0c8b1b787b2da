"""Click CLI (parity with the reference's ``multimeditron``/``mm`` entry
points, ``cli/__init__.py:17-23``). Console scripts: ``multimeditron-tpu``
and ``mmt``."""

from __future__ import annotations

import logging

import click

EPILOG = "multimeditron-tpu — TPU-native multimodal LLM framework"


@click.group(epilog=EPILOG)
@click.option("--verbose", "-v", is_flag=True, help="Enable verbose logging")
def main_cli(verbose: bool = False):
    logging.basicConfig(
        level=logging.DEBUG if verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )


# Register subcommands.
from multimeditron_tpu.cli import train as _train  # noqa: E402,F401
from multimeditron_tpu.cli import preprocess as _preprocess  # noqa: E402,F401
from multimeditron_tpu.cli import generate as _generate  # noqa: E402,F401
from multimeditron_tpu.cli import rlhf as _rlhf  # noqa: E402,F401
from multimeditron_tpu.cli import experts as _experts  # noqa: E402,F401
from multimeditron_tpu.cli import exec_service as _exec_service  # noqa: E402,F401
from multimeditron_tpu.cli import prep_images as _prep_images  # noqa: E402,F401
from multimeditron_tpu.cli import evaluate as _evaluate  # noqa: E402,F401

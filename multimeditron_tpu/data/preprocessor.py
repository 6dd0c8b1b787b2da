"""Dataset preprocessing pipeline (map / filter / shuffle stages).

Capability parity with the reference's preprocessor framework
(``dataset/preprocessor/__init__.py``, ``python.py``, ``shuffle.py``):
string-registered stages applied in sequence over an HF ``datasets``
Dataset, with caching disabled during the run.

The ``python`` / ``python-filter`` stages execute YAML-embedded code via
eval/exec like the reference — but here that capability is explicitly
gated: stages raise unless the pipeline is run with ``allow_code=True``
(CLI flag ``--allow-code``), per SURVEY.md §7.4.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List

from multimeditron_tpu.registry import Registry

logger = logging.getLogger(__name__)


class BaseDatasetPreprocessor:
    name: str = ""
    requires_code_execution: bool = False

    def _process(self, ds, num_processes: int, **kwargs):
        raise NotImplementedError

    def process(self, ds, num_processes: int, **kwargs):
        logger.debug("Running preprocessor: %s", self.name)
        return self._process(ds, num_processes, **kwargs)

    def __call__(self, ds, num_processes: int, **kwargs):
        return self.process(ds, num_processes, **kwargs)


AutoDatasetPreprocessor = Registry("dataset preprocessor", BaseDatasetPreprocessor)


def run_preprocessors(
    ds,
    num_processes: int,
    processes: List[Dict[str, Any]],
    allow_code: bool = False,
):
    """Apply configured stages in order. Each entry: {type, kwargs}."""
    from datasets import disable_caching, enable_caching, is_caching_enabled

    was_caching = is_caching_enabled()
    disable_caching()
    try:
        for idx, proc in enumerate(processes):
            ptype = proc["type"] if isinstance(proc, dict) else proc.type
            kwargs = dict(
                proc.get("kwargs", {}) if isinstance(proc, dict) else proc.kwargs
            )
            processor = AutoDatasetPreprocessor.create(ptype)
            if processor.requires_code_execution and not allow_code:
                raise PermissionError(
                    f"Preprocessor {ptype!r} executes config-embedded Python "
                    "code; pass --allow-code (allow_code=True) to enable it."
                )
            logger.info(
                "Running processor [%d/%d]: %s", idx + 1, len(processes), ptype
            )
            ds = processor(ds, num_processes, **kwargs)
    finally:
        if was_caching:
            enable_caching()
    return ds


def _exec_imports(imports):
    import importlib

    env = {}
    for imp in imports or []:
        env[imp] = importlib.import_module(imp)
    return env


def _exec_py(idx, data, code, env):
    scope = {**env, "idx": idx, "data": data}
    if isinstance(code, str):
        lines = [l for l in code.strip().split("\n")]
        if len(lines) == 1:
            return eval(code, scope)
        code = lines
    # exec everything except the last line, eval the last
    for line in code[:-1]:
        exec(line, scope)
    return eval(code[-1], scope)


@AutoDatasetPreprocessor.register("python")
class PythonProcessor(BaseDatasetPreprocessor):
    requires_code_execution = True

    def _process(self, ds, num_processes, func=None, imports=(), remove_columns=()):
        env = _exec_imports(imports)

        def fn(data, idx):
            return _exec_py(idx, data, func, env)

        return ds.map(
            fn,
            batched=False,
            num_proc=num_processes or None,
            with_indices=True,
            remove_columns=list(remove_columns),
        )


@AutoDatasetPreprocessor.register("python-filter")
class PythonFilterProcessor(BaseDatasetPreprocessor):
    requires_code_execution = True

    def _process(self, ds, num_processes, func=None, imports=()):
        env = _exec_imports(imports)

        def fn(data, idx):
            return _exec_py(idx, data, func, env)

        return ds.filter(
            fn, batched=False, num_proc=num_processes or None, with_indices=True
        )


@AutoDatasetPreprocessor.register("shuffle")
class ShuffleProcessor(BaseDatasetPreprocessor):
    def _process(self, ds, num_processes, seed: int = 42):
        return ds.shuffle(seed=seed)

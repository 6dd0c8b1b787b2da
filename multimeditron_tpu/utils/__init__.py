"""Small shared utilities (parity with reference ``utils/__init__.py``)."""

from __future__ import annotations


def get_dtype(name: str):
    """str -> jnp dtype (reference ``get_torch_dtype``, ``utils/__init__.py:7-11``)."""
    import jax.numpy as jnp

    dtypes = {
        "float32": jnp.float32,
        "float16": jnp.float16,
        "bfloat16": jnp.bfloat16,
        "int8": jnp.int8,
    }
    if name not in dtypes:
        raise ValueError(f"Unknown dtype {name!r} (known: {sorted(dtypes)})")
    return dtypes[name]

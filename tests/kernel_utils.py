"""Shared helper for kernel tests: run a Pallas-calling function in
interpret mode on CPU (monkeypatching pallas_call so the op under test
needs no TPU).  One definition — the previous per-file copies drifted."""

from unittest import mock


def run_interpret(fn, *args, **kwargs):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        return fn(*args, **kwargs)

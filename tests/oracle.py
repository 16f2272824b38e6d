"""Load the reference implementation's pure-torch fallback as a golden
oracle.

The reference repo (read-only at /root/reference) is imported *by file
path* purely to compare numerical outputs in tests; none of its code is
vendored. Heavy/unavailable dependencies of the reference modules
(sentence_transformers, accelerate, the CUDA extension) are stubbed.
"""

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


def _load_by_path(name: str, path: Path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_ops():
    """Returns (pack_module, quant_gemm_module) from the reference."""
    if not REFERENCE_ROOT.exists():  # pragma: no cover
        import pytest

        pytest.skip("reference repo not available")

    # Stub only modules that are genuinely missing; the reference never
    # exercises them on the pure-torch path.
    for mod in ("accelerate", "tqdm"):
        try:
            __import__(mod)
        except ImportError:  # pragma: no cover
            _stub_module(mod)
    try:
        import sentence_transformers.SentenceTransformer  # noqa: F401
    except ImportError:
        st_pkg = _stub_module("sentence_transformers")
        st_mod = _stub_module(
            "sentence_transformers.SentenceTransformer",
            SentenceTransformer=type("SentenceTransformer", (), {}),
        )
        st_pkg.SentenceTransformer = st_mod
    # fake 'vptq' package so `import vptq` inside pack.py succeeds
    _stub_module("vptq")
    _stub_module("vptq.utils")

    pack = _load_by_path(
        "vptq.utils.pack", REFERENCE_ROOT / "vptq/utils/pack.py"
    )
    sys.modules["vptq.utils"].pack = pack
    quant_gemm = _load_by_path(
        "vptq.ops.quant_gemm", REFERENCE_ROOT / "vptq/ops/quant_gemm.py"
    )
    return pack, quant_gemm

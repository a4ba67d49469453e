"""Top-level export parity with the reference packages.

Parses the reference packages' ``__init__.py`` import lists and asserts
every public name resolves on the corresponding ``viscy_tpu`` package, so
reference imports port one-for-one (docs/MIGRATION.md). Skipped when the
reference checkout is absent.
"""

import ast
import importlib
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")

PACKAGES = {
    "packages/viscy-data": "viscy_tpu.data",
    "packages/viscy-transforms": "viscy_tpu.transforms",
    "packages/viscy-models": "viscy_tpu.models",
    "packages/viscy-utils": "viscy_tpu.training",
    "applications/cytoland": "viscy_tpu.apps.cytoland",
    "applications/dynacell": "viscy_tpu.apps.dynacell",
    "applications/airtable": "viscy_tpu.apps.airtable_utils",
}

# intentionally absent: import-time side effects / torch-only plumbing
EXEMPT: dict[str, set] = {}


def _ref_exports(pkg: str) -> list[str]:
    init = next((REFERENCE / pkg / "src").glob("*/__init__.py"))
    tree = ast.parse(init.read_text())
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            if node.module.startswith("importlib"):
                continue
            for a in node.names:
                names.add(a.asname or a.name)
        # lazy-export packages declare their surface via a literal __all__
        if isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "__all__" for t in node.targets
        ):
            if isinstance(node.value, (ast.List, ast.Tuple)):
                for elt in node.value.elts:
                    if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                        names.add(elt.value)
    return sorted(
        n for n in names if not n.startswith("_") and n not in ("version",)
    )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
@pytest.mark.parametrize("pkg", sorted(PACKAGES))
def test_reference_exports_resolve(pkg):
    mod = importlib.import_module(PACKAGES[pkg])
    missing = [
        n
        for n in _ref_exports(pkg)
        if n not in EXEMPT.get(pkg, set()) and not hasattr(mod, n)
    ]
    assert not missing, f"{pkg} exports missing from {PACKAGES[pkg]}: {missing}"

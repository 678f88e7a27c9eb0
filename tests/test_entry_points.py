"""Every console script in pyproject [project.scripts] must resolve.

Round-3 verdict found two CLIs missing from the scripts table while 21
others were registered; this pins the inverse failure too — a registered
entry point whose module/function was renamed away would break on install,
not in any test. Imports only (no mains run), so it also catches
import-time errors in rarely-driven CLI modules.
"""

import importlib
import os

try:
    import tomllib  # Python >= 3.11
except ImportError:  # pragma: no cover — 3.10 fallback (pyproject >=3.10)
    import tomli as tomllib  # type: ignore[no-redef]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scripts() -> dict[str, str]:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]["scripts"]


def test_every_console_script_resolves():
    scripts = _scripts()
    assert scripts, "no [project.scripts] table"
    for name, target in scripts.items():
        module, _, func = target.partition(":")
        mod = importlib.import_module(module)
        fn = getattr(mod, func, None)
        assert callable(fn), f"{name} -> {target} does not resolve"


def test_every_cli_module_is_registered():
    """The inverse direction: every cli/*.py with a main() has a console
    script (private helpers like _common are exempt)."""
    scripts = {t.partition(":")[0] for t in _scripts().values()}
    cli_dir = os.path.join(REPO, "multimodalbrainsurvival_tpu", "cli")
    for fname in sorted(os.listdir(cli_dir)):
        if not fname.endswith(".py") or fname.startswith("_"):
            continue
        module = f"multimodalbrainsurvival_tpu.cli.{fname[:-3]}"
        assert module in scripts, f"{module} has no [project.scripts] entry"

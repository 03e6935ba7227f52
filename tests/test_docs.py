"""docs/OPERATORS.md currency: the generated API index must match what
the generator produces from today's source, and every package module
must be covered by the generator's section map (a hard-coded list
silently rots — it missed the round-5 classifier/lm modules and the
streaming gates until round 6)."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "gen_operator_index",
        os.path.join(ROOT, "scripts", "gen_operator_index.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_module_in_a_section():
    assert _load_gen().check_complete() == []


def test_operator_index_is_current():
    gen = _load_gen()
    with open(os.path.join(ROOT, "docs", "OPERATORS.md")) as f:
        committed = f.read()
    assert committed == gen.render(), (
        "docs/OPERATORS.md is stale — run scripts/gen_operator_index.py")

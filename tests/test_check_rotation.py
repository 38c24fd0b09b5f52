"""Registry-aging checker: the certification-rotation policy itself.

Two rules, both enforced by scripts/check_rotation.py:
  1. no oracled entry's last driver-green row ages past MAX_AGE rounds
     (front-50 entries count as green next round);
  2. every query listed in __spark_entry__.CHANGED_QUERIES (its
     implementation changed this round) sits in the front-50 — row age
     alone cannot see a stale-by-code-change certification.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import __spark_entry__ as entrymod  # noqa: E402
import check_rotation  # noqa: E402


def test_current_registry_passes():
    assert check_rotation.main() == 0


def test_changed_query_outside_front50_fails(monkeypatch, capsys):
    back_query = list(entrymod.queries())[check_rotation.FRONT]
    monkeypatch.setattr(
        entrymod, "CHANGED_QUERIES",
        set(entrymod.CHANGED_QUERIES) | {back_query},
    )
    assert check_rotation.main() == 1
    assert f"CHANGED-NOT-FRONTED {back_query}" in capsys.readouterr().out


def test_changed_query_not_in_registry_fails(monkeypatch, capsys):
    monkeypatch.setattr(
        entrymod, "CHANGED_QUERIES",
        set(entrymod.CHANGED_QUERIES) | {"no_such_query"},
    )
    assert check_rotation.main() == 1
    assert "CHANGED-UNKNOWN no_such_query" in capsys.readouterr().out


def test_all_changed_queries_exist():
    names = set(entrymod.queries())
    assert entrymod.CHANGED_QUERIES <= names


def test_no_duplicate_literal_registry_keys():
    """A rotation that promotes a query without deleting its old
    position leaves a duplicate dict-literal key: Python silently keeps
    the FIRST occurrence's position, so the dict-level uniqueness check
    passes while the dead back entry misleads the next rotation edit.
    Catch it at the source level."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(entrymod))
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    keys = [
                        k.value
                        for k in sub.keys
                        if isinstance(k, ast.Constant)
                    ]
                    dupes = sorted(
                        {k for k in keys if keys.count(k) > 1}
                    )
                    assert not dupes, f"duplicate registry keys: {dupes}"
            return
    raise AssertionError("queries() not found")

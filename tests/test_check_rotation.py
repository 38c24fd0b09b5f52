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

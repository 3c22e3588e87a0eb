"""Meta-test: every `lax.scan` whose body emits a collective must route
`unroll` through the collective-safe guard.

Why this exists (CLAUDE.md / VERDICT r4 #7): XLA:CPU's in-process
collectives rendezvous on (run_id, op_id); a scan body re-executes the
SAME collective instruction every trip, so all trips share one
rendezvous key and under thread starvation a straggler from trip i can
be joined by peers at trip i+1 — a hard CHECK, NaN, or a silently wrong
finite loss (reproducer: scripts/repro_ada_nan.py).
`ops/lanczos.py:_collective_safe_unroll` fully unrolls such loops when
the backend is CPU and the op is sharded. This test makes the rule
suite-enforced instead of memory-enforced: it AST-scans the package for
scan calls whose body functions (directly, or via one level of
same-module calls) contain `psum` / `ppermute` / `all_gather` / … and
fails unless the scan's `unroll=` expression mentions the guard.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "lanczosnet_tpu"

COLLECTIVES = {
    "psum",
    "pmean",
    "pmax",
    "pmin",
    "ppermute",
    "pshuffle",
    "all_gather",
    "all_to_all",
    "psum_scatter",
    "pgather",
    "axis_index",  # not a collective, but only legal under shard_map —
    # a scan body using it is a sharded-loop smell worth the same review
}
GUARD_NAMES = {"collective_safe_unroll", "_collective_safe_unroll"}


def _called_names(tree: ast.AST) -> set[str]:
    """Terminal names of every call in the subtree (foo, mod.foo → foo)."""
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            if isinstance(node.func, ast.Attribute):
                out.add(node.func.attr)
            elif isinstance(node.func, ast.Name):
                out.add(node.func.id)
    return out


def _mentions_guard(node: ast.AST) -> bool:
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name) and sub.id in GUARD_NAMES:
            return True
        if isinstance(sub, ast.Attribute) and sub.attr in GUARD_NAMES:
            return True
    return False


def _collect_funcs(tree: ast.AST) -> dict[str, ast.AST]:
    """name → def node for every function/lambda-assignment in the file
    (last definition wins; good enough for a lint)."""
    funcs: dict[str, ast.AST] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs[node.name] = node
        elif isinstance(node, ast.Assign) and isinstance(
            node.value, ast.Lambda
        ):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    funcs[t.id] = node.value
    return funcs


def _body_has_collective(
    body: ast.AST, funcs: dict[str, ast.AST], depth: int = 1
) -> bool:
    called = _called_names(body)
    if called & COLLECTIVES:
        return True
    if depth <= 0:
        return False
    # one level of same-module indirection: body() → helper() → psum
    return any(
        name in funcs
        and funcs[name] is not body
        and _body_has_collective(funcs[name], funcs, depth - 1)
        for name in called
    )


def _scan_violations(path: Path) -> list[str]:
    tree = ast.parse(path.read_text(), filename=str(path))
    funcs = _collect_funcs(tree)
    violations = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        is_scan = (isinstance(f, ast.Attribute) and f.attr == "scan") or (
            isinstance(f, ast.Name) and f.id == "scan"
        )
        if not is_scan or not node.args:
            continue
        body_arg = node.args[0]
        body_node: ast.AST | None
        if isinstance(body_arg, ast.Lambda):
            body_node = body_arg
        elif isinstance(body_arg, ast.Name):
            body_node = funcs.get(body_arg.id)
        else:
            body_node = body_arg  # e.g. partial(fn, ...): walk the expr
        if body_node is None or not _body_has_collective(body_node, funcs):
            continue
        unroll_kw = next(
            (kw for kw in node.keywords if kw.arg == "unroll"), None
        )
        if unroll_kw is None or not _mentions_guard(unroll_kw.value):
            rel = (
                path.relative_to(PKG.parent)
                if path.is_relative_to(PKG.parent)
                else path.name
            )
            violations.append(
                f"{rel}:{node.lineno}: lax.scan "
                "body emits a collective but unroll= does not route "
                "through collective_safe_unroll (CPU rendezvous-reuse "
                "hazard — see ops/lanczos.py:_collective_safe_unroll)"
            )
    return violations


def test_no_unguarded_collectives_inside_scans():
    violations = []
    for path in sorted(PKG.rglob("*.py")):
        violations += _scan_violations(path)
    assert not violations, "\n".join(violations)


def test_detector_catches_a_violation(tmp_path):
    """The lint itself must fire on the known-bad pattern (direct and
    one-level-indirect), and stay quiet on the guarded form."""
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import jax\n"
        "def body(c, x):\n"
        "    return jax.lax.psum(c, 'dp'), x\n"
        "def run(xs):\n"
        "    return jax.lax.scan(body, 0.0, xs)\n"
        "def outer(c, x):\n"
        "    return body(c, x)\n"
        "def run2(xs):\n"
        "    return jax.lax.scan(outer, 0.0, xs, unroll=2)\n"
    )
    assert len(_scan_violations(bad)) == 2

    good = tmp_path / "good.py"
    good.write_text(
        "import jax\n"
        "from lanczosnet_tpu.ops.lanczos import _collective_safe_unroll\n"
        "def body(c, x):\n"
        "    return jax.lax.psum(c, 'dp'), x\n"
        "def run(xs, k):\n"
        "    return jax.lax.scan(body, 0.0, xs,\n"
        "                        unroll=_collective_safe_unroll('dp', k))\n"
    )
    assert _scan_violations(good) == []

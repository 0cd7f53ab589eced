#!/usr/bin/env python
"""Propose the next round's driver window from the evidence record.

The round driver verifies only the FIRST ``DRIVER_WINDOW`` entries of
``__spark_entry__.queries()`` per round, so window rotation is how
cumulative evidence stays fresh. The policy (established r09):

1. MANDATORY names first — queries with no green row yet, or whose
   plan changed after their latest green row (passed as CLI args;
   plan-change detection needs human/git judgment).
2. Remaining slots go to EVIDENCE FRESHNESS: the oracle-backed queries
   whose latest green CORRECTNESS row is oldest (ties broken
   alphabetically, so the proposal is deterministic).
3. Rows-only queries never take a slot unless named explicitly — the
   driver's rows>0 check is too weak to spend rotation slots on once
   each has been evidenced (the one r07 exemption cycled them all).

Usage:
    python rotate_window.py                 # freshness-only proposal
    python rotate_window.py q_foo q_bar     # mandatory names lead
    python rotate_window.py --staleness     # queries whose function
                                            # changed after their green

Prints the ready-to-paste ``_PRIORITY`` tuple body plus an
evidence-age histogram. ``--staleness`` is the mandatory-list finder:
it dates each query's defining FUNCTION — and, one import-level deep,
every package helper that function calls (VERDICT r09 item 3) and
every package ALL_CAPS constant it references (review r10: a bumped
shared threshold changes the plan with no function edit) — via ``git
log -L :funcname:file`` (functions) / ``git log -G '^NAME\\s*[:=]'``
(constants) and flags any committed after the CORRECTNESS artifact
holding the query's latest green row — the r08 q_qte situation (plan
rewritten after its green row) and the r09 CC-gate situation (shared
operator rewritten under unchanged consumers), both found
mechanically.
Flagged names belong in the next mandatory list unless the diff
demonstrably didn't touch the plan. Purely driver-side: reads
CORRECTNESS_r*.json, the registry, and git metadata; starts no Spark
session.
"""

from __future__ import annotations

import functools
import glob
import json
import os
import re
import sys


def latest_green(repo: str, upto: int | None = None) -> dict[str, int]:
    """query -> newest round with a green driver row (hash-green for
    oracle queries; err-free rows row for rows-only). ``upto`` caps
    the rounds considered — used by the pin test to reproduce a
    window from the evidence that existed when it was frozen, so the
    next round's artifact landing doesn't retroactively redden it."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", f)
        if not m:
            continue
        rnd = int(m.group(1))
        if upto is not None and rnd > upto:
            continue
        with open(f) as fh:
            rows = json.load(fh)
        for q, v in rows.items():
            green = v.get("hash_match") is True or (
                # rows-only driver rows: err == "no_oracle", rows > 0
                v.get("err") == "no_oracle"
                and (v.get("spark_rows") or 0) > 0
            )
            if green:
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def propose(mandatory: list[str], upto: int | None = None) -> list[str]:
    from frauddetection_spark.plans.registry import DRIVER_WINDOW, load_all

    repo = os.path.dirname(os.path.abspath(__file__))
    reg = load_all()
    unknown = [n for n in mandatory if n not in reg]
    if unknown:
        raise SystemExit(f"unknown mandatory names: {unknown}")
    latest = latest_green(repo, upto=upto)
    oracle = {n for n, s in reg.items() if s.oracle is not None}

    window = list(dict.fromkeys(mandatory))  # dedupe, keep order
    # never-evidenced oracle queries are implicitly mandatory
    for n in sorted(oracle - set(latest) - set(window)):
        window.append(n)
    fill = sorted(
        (n for n in oracle if n not in window),
        key=lambda n: (latest[n], n),
    )
    window.extend(fill[: DRIVER_WINDOW - len(window)])
    if len(window) > DRIVER_WINDOW:
        raise SystemExit(
            f"{len(window)} names for a {DRIVER_WINDOW}-slot window — "
            "trim the mandatory list"
        )

    ages: dict[int, int] = {}
    for n in window:
        ages[latest.get(n, 0)] = ages.get(latest.get(n, 0), 0) + 1
    print("# evidence age of proposed window (green-round -> count):")
    for rnd in sorted(ages):
        label = f"r{rnd:02d}" if rnd else "never"
        print(f"#   {label}: {ages[rnd]}")
    print("# paste into plans/registry.py::_PRIORITY:")
    for n in window:
        print(f'    "{n}",')
    return window


def _git_artifact_time(repo: str, path: str) -> int:
    import subprocess

    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", path],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    return int(out) if out else 0


_FUNC_TIME_CACHE: dict[tuple[str, str], int] = {}


def _git_func_time(repo: str, funcname: str, rel: str) -> int:
    """Last-commit time of a function's ``git log -L`` range, memoized —
    the helper scan re-dates the same operator helpers for hundreds of
    consumer queries."""
    import subprocess

    key = (funcname, rel)
    if key not in _FUNC_TIME_CACHE:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "-s",
             "-L", f":{funcname}:{rel}"],
            cwd=repo,
            capture_output=True,
            text=True,
        ).stdout.strip()
        _FUNC_TIME_CACHE[key] = int(out.splitlines()[0]) if out else 0
    return _FUNC_TIME_CACHE[key]


def unwrap_query_fn(fn):
    """Follow the registry's ``guarded`` closure to the real query
    function (for its source file and true ``__name__``)."""
    import inspect

    src = inspect.getsourcefile(fn)
    if src and src.endswith("registry.py"):
        inner = [
            c.cell_contents
            for c in (fn.__closure__ or [])
            if callable(getattr(c, "cell_contents", None))
        ]
        if inner:
            return inner[0]
    return fn


# functools.cache on the AST walkers, keyed by the (long-lived,
# registry-held) function object: ``staleness()`` walks all ~309 query
# functions, and each test/tool invocation that calls it repeats every
# inspect.getsource + ast.parse — the walk result is pure in the
# function's source, which cannot change within one process.
@functools.cache
def helpers_of(fn) -> tuple[tuple[str, str], ...]:
    """(funcname, relpath) for every package-defined function the
    query's defining function CALLS, one import-level deep (VERDICT
    r09 item 3: function-level ``git log -L`` dates the query body
    only, so a rewrite inside a shared helper — the r09
    ``connected_components`` gate refactor in operators/graph.py —
    never flagged its consumer queries as stale).

    Static resolution: ast-walk the function source for ``Call`` nodes,
    resolve plain names through the function's ``__globals__`` plus any
    ``import``/``from-import`` statements INSIDE the body (the
    dominant pattern here — most queries import operators locally),
    and ``mod.attr`` calls through module objects. Only functions whose
    source file lives under ``frauddetection_spark/`` count; one level
    only (helpers' own callees are out of scope by design — the
    operators tree is shallow and a two-level walk would date half the
    package for every query)."""
    import ast
    import importlib
    import inspect
    import textwrap
    import types

    repo = os.path.dirname(os.path.abspath(__file__))
    pkg_root = os.path.join(repo, "frauddetection_spark")
    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        return ()

    # Decorators are Call nodes in the function's source but are not
    # part of the built plan (the registration decorator would
    # otherwise resolve as a "helper" of all 309 queries and a
    # registry.py commit would stale every green row at once — 240 of
    # 259 flags in the first r10 scan). Strip them before the walk.
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            node.decorator_list = []

    local: dict[str, object] = {}
    called: set[str] = set()
    modattr: set[tuple[str, str]] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
            try:
                mod = importlib.import_module(node.module)
            except ImportError:
                continue
            for alias in node.names:
                local[alias.asname or alias.name] = getattr(
                    mod, alias.name, None
                )
        elif isinstance(node, ast.Import):
            for alias in node.names:
                try:
                    mod = importlib.import_module(alias.name)
                except ImportError:
                    continue
                local[alias.asname or alias.name.split(".")[0]] = mod
        elif isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name):
                called.add(f.id)
            elif isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name):
                modattr.add((f.value.id, f.attr))

    g = getattr(fn, "__globals__", {})
    out: set[tuple[str, str]] = set()

    def consider(obj) -> None:
        if not isinstance(obj, types.FunctionType) or obj is fn:
            return
        try:
            srcfile = inspect.getsourcefile(obj)
        except TypeError:
            return
        if not srcfile:
            return
        srcfile = os.path.abspath(srcfile)
        if not srcfile.startswith(pkg_root + os.sep):
            return
        # plans/registry.py is excluded by POLICY: a change there
        # stales all 309 queries at once — far beyond a 50-slot
        # window's capacity — and the registration path is guarded by
        # the parity/lint suite (tests/test_registry_lint.py, the
        # hostile-config sweep), not by driver re-evidencing. Any
        # registry change still surfaces loudly: the pin tests that
        # reproduce the frozen window fail on rotation-policy drift.
        if srcfile.endswith(os.path.join("plans", "registry.py")):
            return
        out.add((obj.__name__, os.path.relpath(srcfile, repo)))

    for nm in called:
        consider(local.get(nm, g.get(nm)))
    for modnm, attr in modattr:
        holder = local.get(modnm, g.get(modnm))
        if isinstance(holder, types.ModuleType):
            consider(getattr(holder, attr, None))
    return tuple(sorted(out))


_CONST_RE = re.compile(r"^[A-Z][A-Z0-9_]*$")

_CONST_TIME_CACHE: dict[tuple[str, str], int] = {}


def _git_const_time(repo: str, name: str, rel: str) -> int:
    """Last commit whose diff in ``rel`` touched a top-level assignment
    to ``name`` (``git log -G``) — constants have no funcname range for
    ``-L``, but ``-G '^NAME\\s*[:=]'`` catches value edits (which keep
    the occurrence count identical and so evade ``-S``). Memoized."""
    import subprocess

    key = (name, rel)
    if key not in _CONST_TIME_CACHE:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct",
             "-G", rf"^{re.escape(name)}\s*[:=]", "--", rel],
            cwd=repo,
            capture_output=True,
            text=True,
        ).stdout.strip()
        _CONST_TIME_CACHE[key] = int(out.splitlines()[0]) if out else 0
    return _CONST_TIME_CACHE[key]


@functools.cache
def constants_of(fn) -> tuple[tuple[str, str], ...]:
    """(const_name, definer_relpath) for every package-defined
    ALL_CAPS module-level constant the query's defining function
    references (review r10: ``helpers_of`` dates only FUNCTIONS, so
    bumping a shared threshold — a sampling rate, an LSH band count, a
    gate constant — changed the shipped plan without ever staling its
    consumers' evidence).

    Resolution mirrors ``helpers_of``: ALL_CAPS ``Name`` loads resolve
    through body-local from-imports, then the module file's top-level
    from-imports and assignments (parsed statically — a value object
    carries no defining-module link); ``mod.CONST`` attribute reads
    resolve through module objects. Only definers under
    ``frauddetection_spark/`` count, registry.py excluded by the same
    policy as helpers_of."""
    import ast
    import importlib
    import inspect
    import textwrap
    import types

    repo = os.path.dirname(os.path.abspath(__file__))
    pkg_root = os.path.join(repo, "frauddetection_spark")
    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
        mod_file = inspect.getsourcefile(fn)
        with open(mod_file) as fh:
            mod_tree = ast.parse(fh.read())
    except (OSError, TypeError, SyntaxError):
        return ()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            node.decorator_list = []

    body_from: dict[str, tuple[str, str]] = {}
    refs: set[str] = set()
    modattrs: set[tuple[str, str]] = set()
    assigned: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
            for a in node.names:
                body_from[a.asname or a.name] = (node.module, a.name)
        elif isinstance(node, ast.Name):
            if isinstance(node.ctx, ast.Load):
                refs.add(node.id)
            else:
                assigned.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            modattrs.add((node.value.id, node.attr))

    top_from: dict[str, tuple[str, str]] = {}
    top_assign: set[str] = set()
    for node in mod_tree.body:
        if isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
            for a in node.names:
                top_from[a.asname or a.name] = (node.module, a.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    top_assign.add(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            top_assign.add(node.target.id)

    def definer_file(modname: str) -> str | None:
        try:
            m = importlib.import_module(modname)
        except ImportError:
            return None
        f = getattr(m, "__file__", None)
        return os.path.abspath(f) if f else None

    def in_pkg(f: str | None) -> bool:
        return bool(
            f
            and f.startswith(pkg_root + os.sep)
            and not f.endswith(os.path.join("plans", "registry.py"))
        )

    out: set[tuple[str, str]] = set()
    for nm in refs - assigned:
        if not _CONST_RE.match(nm):
            continue
        src_import = body_from.get(nm) or top_from.get(nm)
        if src_import is not None:
            f = definer_file(src_import[0])
            orig = src_import[1]
        elif nm in top_assign:
            f, orig = os.path.abspath(mod_file), nm
        else:
            continue
        if in_pkg(f):
            out.add((orig, os.path.relpath(f, repo)))
    g = getattr(fn, "__globals__", {})
    for modnm, attr in modattrs:
        if not _CONST_RE.match(attr):
            continue
        holder = g.get(modnm)
        if isinstance(holder, types.ModuleType):
            f = getattr(holder, "__file__", None)
            f = os.path.abspath(f) if f else None
            if in_pkg(f) and not callable(getattr(holder, attr, None)):
                out.add((attr, os.path.relpath(f, repo)))
    return tuple(sorted(out))


def staleness() -> list[tuple[str, int, str]]:
    """(query, latest_green_round, reason) for every query whose
    defining FUNCTION — or any package helper it calls, one
    import-level deep — was last committed after the commit of the
    CORRECTNESS artifact holding its latest green row. The direct leg
    is the r08 q_qte situation (plan rewritten after its green); the
    helper leg is the r09 CC-gate situation (shared operator rewritten
    under unchanged consumers), both found mechanically via ``git log
    -L :funcname:file``. Caveat: -L tracks the function body from its
    ``def`` line, so an edit ONLY to the @register oracle string above
    the def can be attributed to the preceding function's range —
    treat a clean report as strong but not absolute, and any flag as a
    mandatory-list candidate."""
    import inspect

    from frauddetection_spark.plans.registry import load_all

    repo = os.path.dirname(os.path.abspath(__file__))

    def artifact_time(path: str) -> int:
        return _git_artifact_time(repo, path)

    def func_time(funcname: str, rel: str) -> int:
        return _git_func_time(repo, funcname, rel)

    latest = latest_green(repo)
    reg = load_all()
    artifact_ct = {
        rnd: artifact_time(f"CORRECTNESS_r{rnd:02d}.json")
        for rnd in sorted(set(latest.values()))
    }
    flagged = []
    # An artifact with NO git history (just written by the driver, not
    # yet committed) must flag its queries as staleness-UNKNOWN, not
    # silently exempt the whole round — a false-clean report here is
    # the exact failure the tool exists to catch (review r09).
    for rnd, ct in artifact_ct.items():
        if ct == 0:
            print(
                f"# WARNING: CORRECTNESS_r{rnd:02d}.json has no git "
                "history — staleness unknown for its queries",
                file=sys.stderr,
            )
            for name, r in latest.items():
                if r == rnd:
                    flagged.append(
                        (name, rnd, f"CORRECTNESS_r{rnd:02d} uncommitted — "
                         "staleness unknown")
                    )
    for name, spec in reg.items():
        rnd = latest.get(name)
        if rnd is None:
            flagged.append((name, 0, "never driver-evidenced"))
            continue
        fn = unwrap_query_fn(spec.fn)
        src = inspect.getsourcefile(fn)
        rel = os.path.relpath(src, repo)
        fct = func_time(fn.__name__, rel)
        if fct == 0:
            flagged.append((name, rnd, f"git -L found no {fn.__name__} in {rel}"))
            continue
        if artifact_ct.get(rnd, 0) and fct > artifact_ct[rnd]:
            flagged.append(
                (
                    name,
                    rnd,
                    f"{rel}::{fn.__name__} committed after "
                    f"CORRECTNESS_r{rnd:02d}",
                )
            )
            continue
        # helper leg (one import-level deep): a shared operator
        # rewritten after this query's green row stales its evidence
        # just as surely as a body edit — first stale helper wins
        hit = False
        for hname, hrel in helpers_of(fn):
            hct = func_time(hname, hrel)
            if hct == 0:
                # helper not datable (nested def / rename churn):
                # not flag-worthy on its own — the direct leg above
                # still covers the query body, and a warn keeps the
                # report honest without spending window slots on noise
                print(
                    f"# note: {name}: helper {hrel}::{hname} not "
                    "datable via git -L",
                    file=sys.stderr,
                )
                continue
            if artifact_ct.get(rnd, 0) and hct > artifact_ct[rnd]:
                flagged.append(
                    (
                        name,
                        rnd,
                        f"helper {hrel}::{hname} committed after "
                        f"CORRECTNESS_r{rnd:02d}",
                    )
                )
                hit = True
                break
        if hit:
            continue
        # constants leg (review r10): a bumped shared threshold changes
        # the shipped plan without any function body changing — date
        # every package ALL_CAPS constant the function references
        for cname, crel in constants_of(fn):
            cct = _git_const_time(repo, cname, crel)
            if cct and artifact_ct.get(rnd, 0) and cct > artifact_ct[rnd]:
                flagged.append(
                    (
                        name,
                        rnd,
                        f"constant {crel}::{cname} committed after "
                        f"CORRECTNESS_r{rnd:02d}",
                    )
                )
                break
    for name, rnd, why in flagged:
        print(f"{name} (green r{rnd:02d}): {why}")
    if not flagged:
        print("# no query's function postdates its latest green row")
    return flagged


def check_window() -> list[str]:
    """Order-of-operations gate (VERDICT r10 item 4): round 10 landed
    plan rewrites AFTER its window rotation froze, creating 34
    stale-evidence rows the same session that built the staleness
    detector. This check makes that pattern a failure instead of a
    finding: it re-runs the staleness scan and FAILS (exit 1 via main)
    if any flagged query falls OUTSIDE the frozen ``_PRIORITY`` window
    — i.e. a rewrite touched a plan this round's driver run will not
    re-evidence. Run it at close-out after any plan-bearing change;
    a non-empty result means either re-rotate the window or revert the
    rewrite. Flags INSIDE the window are fine — the driver re-greens
    them this round by construction. The window is derived the way the
    DRIVER derives it — the first ``DRIVER_WINDOW`` entries of
    ``load_all()`` — not from ``_PRIORITY`` directly (review r11: a
    short _PRIORITY pads with registry order, and those implicit fill
    slots ARE re-run this round)."""
    from frauddetection_spark.plans.registry import DRIVER_WINDOW, load_all

    window = set(list(load_all())[:DRIVER_WINDOW])
    flags = {
        name: why
        for name, _rnd, why in staleness()
        if name not in window
    }
    outside = sorted(flags)
    if outside:
        # ADVICE r11: not every flag kind means "rewrite postdates
        # evidence" — a never-evidenced new query or an uncommitted
        # artifact carries a different remediation. Group by cause so
        # the FAIL message matches the actual flag class.
        print("# FAIL: staleness flags outside the frozen window:")
        for name in outside:
            print(f"#   {name}: {flags[name]}")
        print(
            "# remediation by cause: 'never driver-evidenced' → add "
            "the new query to the window or QUEUED_NEXT_WINDOW; "
            "'uncommitted — staleness unknown' → commit the artifact "
            "and re-run; otherwise the plan was rewritten after its "
            "green row → re-rotate (rotate_window.py --staleness) or "
            "revert the rewrite"
        )
    else:
        print("# OK: every staleness flag sits inside the frozen window")
    return outside


if __name__ == "__main__":
    if sys.argv[1:2] == ["--staleness"]:
        staleness()
    elif sys.argv[1:2] == ["--check-window"]:
        sys.exit(1 if check_window() else 0)
    else:
        propose(sys.argv[1:])

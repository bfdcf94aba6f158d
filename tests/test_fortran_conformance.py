"""Fortran BIND(C) <-> C header signature conformance (VERDICT r4 #6).

No Fortran compiler exists in this image, so the module semantics cannot be
executed — but the *signatures* can be machine-checked: this test parses the
BIND(C) interface blocks in ``bindings_fortran/iterative_solver_f.F90`` and
the declarations in ``include/iterative_solver_c.h`` and diffs them
(arg counts, canonical arg types, by-value vs by-reference, return types).
It fails when either side drifts — closing the verifiable half of the
compiled-Fortran gap (reference: IterativeSolverF.F90:78-1046 declares the
same interfaces against IterativeSolverC.h).

Type canonicalisation:
  Fortran                      C
  integer(c_size_t), value  == size_t            (by value)
  integer(c_size_t) / (*)   == size_t*           (by reference)
  real(c_double), value     == double
  real(c_double) / (*)      == double*           (const ignored)
  integer(c_int), value     == int
  integer(c_int) / (*)      == int*
  integer(c_int64_t), value == int64_t
  character(c_char) (*)     == char*
  type(c_funptr), value     == void (*)(...)
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
F90_PATH = os.path.join(REPO, "bindings_fortran", "iterative_solver_f.F90")
HDR_PATH = os.path.join(REPO, "include", "iterative_solver_c.h")


# ---------------------------------------------------------------------------
# C header side
# ---------------------------------------------------------------------------

def _canon_c_type(tok: str) -> str:
    tok = tok.replace("const", "").strip()
    ptr = "*" in tok
    base = tok.replace("*", "").strip()
    base = {"char": "char", "size_t": "size_t", "double": "double",
            "int": "int", "int64_t": "int64_t", "void": "void"}[base]
    return base + ("*" if ptr else "")


def _split_args(argstr: str):
    """Split a C argument list on top-level commas (function-pointer args
    contain nested parens)."""
    out, depth, cur = [], 0, ""
    for ch in argstr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        out.append(cur.strip())
    return out


_C_KEYWORDS = {"const", "*", "size_t", "double", "int", "int64_t", "char",
               "void"}


def _canon_c_arg(a: str) -> str:
    """Canonicalise one C argument, dropping a trailing parameter name."""
    toks = a.replace("*", " * ").split()
    if toks and toks[-1] not in _C_KEYWORDS:
        toks = toks[:-1]
    return _canon_c_type(" ".join(toks))


def parse_c_header(path: str):
    """-> {name: (ret, [argtype, ...])}; function-pointer args canonicalise
    to ('funptr', inner_signature)."""
    with open(path) as fh:
        text = fh.read()
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    text = re.sub(r"//.*", "", text)
    body = text.split('extern "C" {', 1)[1].rsplit("}", 1)[0]
    body = re.sub(r"#\w+[^\n]*", "", body)
    decls = {}
    for m in re.finditer(
            r"([A-Za-z_][\w*\s]+?)\s+(\w+)\s*\(([^;]*?)\)\s*;", body, re.S):
        ret, name, args = m.group(1).strip(), m.group(2), m.group(3)
        argtypes = []
        for a in _split_args(" ".join(args.split())):
            if not a or a == "void":
                continue
            fp = re.match(r"void\s*\(\s*\*\s*\w*\s*\)\s*\((.*)\)", a)
            if fp:
                inner = tuple(_canon_c_arg(t)
                              for t in _split_args(fp.group(1)))
                argtypes.append(("funptr", inner))
                continue
            argtypes.append(_canon_c_arg(a))
        decls[name] = (_canon_c_type(ret), argtypes)
    return decls


# ---------------------------------------------------------------------------
# Fortran side
# ---------------------------------------------------------------------------

_F2C = {
    ("c_size_t", True): "size_t",
    ("c_size_t", False): "size_t*",
    ("c_double", True): "double",
    ("c_double", False): "double*",
    ("c_int", True): "int",
    ("c_int", False): "int*",
    ("c_int64_t", True): "int64_t",
    ("c_int64_t", False): "int64_t*",
    ("c_char", False): "char*",
    ("c_funptr", True): "funptr",
}


def _join_continuations(text: str):
    lines, acc = [], ""
    for raw in text.splitlines():
        line = raw.split("!", 1)[0].rstrip()
        if not line.strip():
            continue
        stripped = line.strip()
        if acc:
            stripped = stripped.lstrip("&").strip()
        if stripped.endswith("&"):
            acc += stripped[:-1]
        else:
            lines.append(acc + stripped)
            acc = ""
    return lines


def parse_f90_interfaces(path: str):
    """-> {bind_name: (ret, [argtype, ...])} for every BIND(C) procedure in
    the module's interface blocks (the abstract callback interface is
    returned separately under its Fortran name)."""
    with open(path) as fh:
        lines = _join_continuations(fh.read())
    procs = {}
    abstract = {}
    i = 0
    while i < len(lines):
        line = lines[i]
        m = re.match(
            r"\s*(subroutine|function)\s+(\w+)\s*\(([^)]*)\)"
            r"(?:\s*result\s*\((\w+)\))?\s*bind\s*\(\s*C\s*"
            r"(?:,\s*name\s*=\s*'(\w+)')?\s*\)",
            line, re.I)
        if not m:
            i += 1
            continue
        kind, fname, argstr, resvar, bindname = m.groups()
        args = [a.strip().lower() for a in argstr.split(",") if a.strip()]
        # collect decls until end subroutine/function
        decls = {}
        j = i + 1
        while j < len(lines) and not re.match(
                r"\s*end\s+(subroutine|function)", lines[j], re.I):
            dm = re.match(
                r"\s*(integer|real|character|type)\s*\(\s*(\w+)\s*\)"
                r"\s*((?:,\s*\w+(?:\s*\(\s*\w+\s*\))?)*)\s*::\s*(.+)",
                lines[j], re.I)
            if dm:
                kindname = dm.group(2).lower()
                attrs = dm.group(3).lower()
                byval = "value" in attrs
                for nm in dm.group(4).split(","):
                    nm = nm.strip()
                    name_only = nm.split("(")[0].strip().lower()
                    decls[name_only] = (kindname, byval)
            j += 1
        argtypes = []
        for a in args:
            if a not in decls:
                raise AssertionError(
                    f"{fname}: argument '{a}' has no type declaration")
            argtypes.append(_F2C[decls[a]])
        if kind.lower() == "function":
            rv = (resvar or fname).lower()
            assert rv in decls, f"{fname}: result '{rv}' undeclared"
            kindname, _ = decls[rv]
            ret = _F2C[(kindname, True)]
        else:
            ret = "void"
        if bindname:
            procs[bindname] = (ret, argtypes)
        else:
            abstract[fname.lower()] = (ret, argtypes)
        i = j + 1
    return procs, abstract


# ---------------------------------------------------------------------------
# The conformance assertions
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sides():
    c = parse_c_header(HDR_PATH)
    f, abstract = parse_f90_interfaces(F90_PATH)
    assert c, "C header parsed to nothing — parser or header broke"
    assert f, "F90 interfaces parsed to nothing — parser or module broke"
    return c, f, abstract


def test_every_fortran_interface_has_a_c_declaration(sides):
    c, f, _ = sides
    missing = sorted(set(f) - set(c))
    assert not missing, f"F90 declares symbols absent from the C header: {missing}"


def test_every_c_declaration_has_a_fortran_interface(sides):
    c, f, _ = sides
    missing = sorted(set(c) - set(f))
    assert not missing, f"C header symbols missing from the F90 module: {missing}"


def test_signatures_agree(sides):
    c, f, _ = sides
    problems = []
    for name in sorted(set(c) & set(f)):
        c_ret, c_args = c[name]
        f_ret, f_args = f[name]
        if c_ret != f_ret:
            problems.append(f"{name}: return {c_ret} (C) != {f_ret} (F90)")
        # funptr args: compare kind only at this level (inner signature is
        # checked against the abstract interface below)
        c_kinds = [a[0] if isinstance(a, tuple) else a for a in c_args]
        if c_kinds != f_args:
            problems.append(
                f"{name}: args {c_kinds} (C) != {f_args} (F90)")
    assert not problems, "\n".join(problems)


def test_addp_callback_matches_abstract_interface(sides):
    """The c_funptr passed to AddP must carry the signature the C side will
    call it with: void (*)(const double*, double*, size_t, const size_t*)
    == the module's iterative_solver_apply_on_p abstract interface."""
    c, _, abstract = sides
    _, c_args = c["IterativeSolverAddP"]
    inner = [a[1] for a in c_args if isinstance(a, tuple) and a[0] == "funptr"]
    assert inner, "AddP lost its function-pointer argument"
    cb = abstract.get("iterative_solver_apply_on_p")
    assert cb is not None, "abstract callback interface missing from F90"
    assert list(inner[0]) == cb[1], (
        f"AddP callback signature drift: C {list(inner[0])} vs F90 {cb[1]}")


def test_parser_detects_drift():
    """The test is only as good as its parsers: a synthetic mismatch must be
    caught (guards against both parsers silently degrading together)."""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".F90", delete=False) as fh:
        fh.write("""
module m
  use iso_c_binding
  interface
    subroutine Foo(a, b) bind(C, name='Foo')
      use iso_c_binding
      integer(c_size_t), value :: a
      real(c_double) :: b(*)
    end subroutine
  end interface
end module m
""")
        f90 = fh.name
    with tempfile.NamedTemporaryFile("w", suffix=".h", delete=False) as fh:
        fh.write("""
extern "C" {
void Foo(size_t a, const double* b, int c);
}
""")
        hdr = fh.name
    try:
        fside, _ = parse_f90_interfaces(f90)
        cside = parse_c_header(hdr)
        assert fside["Foo"] == ("void", ["size_t", "double*"])
        assert cside["Foo"] == ("void", ["size_t", "double*", "int"])
        assert fside["Foo"][1] != cside["Foo"][1]  # drift IS visible
    finally:
        os.unlink(f90)
        os.unlink(hdr)

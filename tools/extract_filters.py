#!/usr/bin/env python3
"""Extract discrete wavelet filter-bank coefficient tables from the reference.

The reference (Prophetizo/JWave) defines 57 discrete filter banks as Java
classes, each setting ``_scalingDeCom`` (and, for biorthogonal families,
``_waveletDeCom``) in its constructor and deriving the remaining filters via
quadrature-mirror construction (reference:
src/main/java/jwave/transforms/wavelets/Wavelet.java:104-122 and
biorthogonal/BiOrthogonal.java:43-66).

Filter coefficients are mathematical constants (the same tables ship with
PyWavelets, which the reference itself validates against — see reference
scripts/generate_reference_data.py). This tool interprets the tiny, highly
regular statement language of those constructors to recover the *numbers*,
then emits a pure-data Python module ``jwave_tpu/filters/data.py``.

Run:  python tools/extract_filters.py
"""
from __future__ import annotations

import math
import os
import re
import sys

REF = "/root/reference/src/main/java/jwave/transforms/wavelets"
OUT = os.path.join(os.path.dirname(__file__), "..", "jwave_tpu", "filters", "data.py")

FAMILY_DIRS = ["haar", "daubechies", "symlets", "coiflet", "legendre", "biorthogonal", "other"]
BASE_CLASSES = {"BiOrthogonal.java"}

ARRAYS = {
    "_scalingDeCom": "sd",
    "_waveletDeCom": "wd",
    "_scalingReCon": "sr",
    "_waveletReCon": "wr",
}


def strip_comments(src: str) -> str:
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    src = re.sub(r"//[^\n]*", "", src)
    return src


def constructor_body(src: str, cls: str) -> str:
    # find `public <cls>(` then matching braces
    m = re.search(r"public\s+%s\s*\(\s*\)\s*\{" % re.escape(cls), src)
    if not m:
        raise ValueError(f"no default constructor in {cls}")
    i = m.end()
    depth = 1
    j = i
    while depth > 0:
        c = src[j]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        j += 1
    return src[i : j - 1]


def java_expr_to_py(expr: str) -> str:
    expr = expr.replace("Math.sqrt", "math.sqrt").replace("Math.pow", "math.pow")
    expr = expr.replace("Math.PI", "math.pi")
    for jname, pname in ARRAYS.items():
        expr = re.sub(re.escape(jname) + r"\s*\[\s*([^\]]+?)\s*\]", pname + r"[\1]", expr)
    return expr


class Ctx:
    def __init__(self):
        self.vars = {"math": math}
        self.arrays = {}  # py name -> list
        self.name = None
        self.mother = None
        self.twave = 2
        self.built = None  # 'orthonormal' | 'biorthogonal' | None


STMT_RE = re.compile(r"[^;{}]+;")


def split_statements(body: str):
    """Yield statements; 'for' loops are yielded as (header, [body statements])."""
    pos = 0
    n = len(body)
    while pos < n:
        m = re.compile(r"\S").search(body, pos)
        if not m:
            break
        pos = m.start()
        if body.startswith("for", pos) and re.match(r"for\s*\(", body[pos:]):
            # parse for( header ) then body: block or single statement
            h0 = body.index("(", pos)
            depth, j = 1, h0 + 1
            while depth:
                if body[j] == "(":
                    depth += 1
                elif body[j] == ")":
                    depth -= 1
                j += 1
            header = body[h0 + 1 : j - 1]
            m2 = re.compile(r"\S").search(body, j)
            j = m2.start()
            if body[j] == "{":
                depth, k = 1, j + 1
                while depth:
                    if body[k] == "{":
                        depth += 1
                    elif body[k] == "}":
                        depth -= 1
                    k += 1
                inner = body[j + 1 : k - 1]
                yield ("for", header, list(split_statements(inner)))
                pos = k
            else:
                k = body.index(";", j) + 1
                stmts = [("stmt", body[j:k])]
                # an `if (...) stmt;` may be followed by `else stmt;`
                m3 = re.compile(r"\S").search(body, k)
                if m3 and body.startswith("else", m3.start()):
                    k2 = body.index(";", m3.start()) + 1
                    stmts.append(("stmt", body[m3.start():k2]))
                    k = k2
                yield ("for", header, stmts)
                pos = k
        else:
            k = body.index(";", pos) + 1
            yield ("stmt", body[pos:k])
            pos = k


def exec_stmt(stmt: str, ctx: Ctx, loop_env=None):
    s = stmt.strip().rstrip(";").strip()
    if not s:
        return
    if s.startswith("super("):
        return
    # single-statement if/else (used by some classes to inline the QMF build)
    m = re.match(r"if\s*\(", s)
    if m:
        depth, j = 1, s.index("(") + 1
        while depth:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        cond_src = java_expr_to_py(s[s.index("(") + 1 : j - 1])
        env = dict(ctx.vars)
        env.update(ctx.arrays)
        env["_motherWavelength"] = ctx.mother
        if loop_env:
            env.update(loop_env)
        cond = bool(eval(cond_src, {}, env))
        if loop_env is not None:
            loop_env["__last_if__"] = cond
        if cond:
            exec_stmt(s[j:], ctx, loop_env)
        return
    if s.startswith("else"):
        if loop_env is None or loop_env.get("__last_if__") is None:
            raise ValueError(f"dangling else: {s!r}")
        if not loop_env["__last_if__"]:
            exec_stmt(s[4:], ctx, loop_env)
        return
    m = re.match(r'_name\s*=\s*"([^"]*)"', s)
    if m:
        ctx.name = m.group(1)
        return
    m = re.match(r"_motherWavelength\s*=\s*(\d+)", s)
    if m:
        ctx.mother = int(m.group(1))
        return
    m = re.match(r"_transformWavelength\s*=\s*(\d+)", s)
    if m:
        ctx.twave = int(m.group(1))
        return
    m = re.match(r"(_scalingDeCom|_waveletDeCom|_scalingReCon|_waveletReCon)\s*=\s*new\s+double", s)
    if m:
        ctx.arrays[ARRAYS[m.group(1)]] = [0.0] * ctx.mother
        return
    if "_buildOrthonormalSpace" in s:
        ctx.built = "orthonormal"
        return
    if "_buildBiOrthonormalSpace" in s:
        ctx.built = "biorthogonal"
        return
    m = re.match(r"double\s+(\w+)\s*=\s*(.+)$", s)
    if m:
        env = dict(ctx.vars)
        env.update(ctx.arrays)
        env["_motherWavelength"] = ctx.mother
        if loop_env:
            env.update(loop_env)
        ctx.vars[m.group(1)] = eval(java_expr_to_py(m.group(2)), {}, env)
        return
    m = re.match(r"(_scalingDeCom|_waveletDeCom|_scalingReCon|_waveletReCon)\s*\[\s*(.+?)\s*\]\s*(\/?=)\s*(.+)$", s)
    if m:
        arr = ctx.arrays[ARRAYS[m.group(1)]]
        env = dict(ctx.vars)
        env.update(ctx.arrays)
        env["_motherWavelength"] = ctx.mother
        if loop_env:
            env.update(loop_env)
        idx = int(eval(java_expr_to_py(m.group(2)), {}, env))
        val = eval(java_expr_to_py(m.group(4)), {}, env)
        if m.group(3) == "/=":
            arr[idx] /= val
        else:
            arr[idx] = val
        return
    raise ValueError(f"unhandled statement: {s!r}")


def exec_for(header: str, body, ctx: Ctx):
    m = re.match(r"int\s+(\w+)\s*=\s*(\d+)\s*;\s*\1\s*([<>]=?)\s*(.+?)\s*;\s*\1\s*(\+\+|--)", header.strip())
    if not m:
        raise ValueError(f"unhandled for header: {header!r}")
    var, start, op, limit_expr, step = m.groups()
    env = dict(ctx.vars)
    env.update(ctx.arrays)
    env["_motherWavelength"] = ctx.mother
    limit = int(eval(java_expr_to_py(limit_expr), {}, env))
    i = int(start)
    rng = range(i, limit) if op == "<" else range(i, limit + 1)
    for iv in rng:
        loop_env = {var: iv}
        for item in body:
            if item[0] == "stmt":
                exec_stmt(item[1], ctx, loop_env=loop_env)
            else:
                raise ValueError("nested for not supported")


def build_orthonormal(ctx: Ctx):
    """Reference Wavelet.java:104-122: QMF high-pass + identical recon filters."""
    n = ctx.mother
    sd = ctx.arrays["sd"]
    wd = [0.0] * n
    for i in range(n):
        v = sd[n - 1 - i]
        wd[i] = v if i % 2 == 0 else -v
    ctx.arrays["wd"] = wd
    ctx.arrays["sr"] = list(sd)
    ctx.arrays["wr"] = list(wd)


def build_biorthogonal(ctx: Ctx):
    """Reference BiOrthogonal.java:43-66: cross-flip with alternating signs."""
    n = ctx.mother
    sd, wd = ctx.arrays["sd"], ctx.arrays["wd"]
    sr = [0.0] * n
    wr = [0.0] * n
    for i in range(n):
        if i % 2 == 0:
            sr[i] = -wd[i]
            wr[i] = -sd[i]
        else:
            sr[i] = wd[i]
            wr[i] = sd[i]
    ctx.arrays["sr"] = sr
    ctx.arrays["wr"] = wr


def extract(path: str):
    cls = os.path.splitext(os.path.basename(path))[0]
    with open(path) as f:
        src = strip_comments(f.read())
    body = constructor_body(src, cls)
    ctx = Ctx()
    for item in split_statements(body):
        if item[0] == "stmt":
            exec_stmt(item[1], ctx)
        else:
            exec_for(item[1], item[2], ctx)
    if ctx.built == "orthonormal":
        build_orthonormal(ctx)
    elif ctx.built == "biorthogonal":
        build_biorthogonal(ctx)
    for key in ("sd", "wd", "sr", "wr"):
        if key not in ctx.arrays:
            raise ValueError(f"{cls}: missing array {key}")
    recon_gain = 0.5 if cls == "Haar1Orthogonal" else 1.0
    return {
        "class": cls,
        "name": ctx.name,
        "transform_wavelength": ctx.twave,
        "dec_lo": ctx.arrays["sd"],
        "dec_hi": ctx.arrays["wd"],
        "rec_lo": ctx.arrays["sr"],
        "rec_hi": ctx.arrays["wr"],
        "recon_gain": recon_gain,
    }


def builder_metadata():
    """Names registered in WaveletBuilder.create plus the create2arr subset."""
    path = os.path.join(REF, "WaveletBuilder.java")
    with open(path) as f:
        src = f.read()
    # a name is creatable iff its case constructs a wavelet (disabled cases
    # throw instead — reference WaveletBuilder.java:363-385)
    registered = []
    for m in re.finditer(r'case\s+"([^"]+)"\s*:\s*\n(.*?)(?=\n\s*case|\n\s*default)', src, flags=re.S):
        body = re.sub(r"//[^\n]*", "", m.group(2))
        if re.search(r"wavelet\s*=\s*new\s+\w+", body):
            registered.append(m.group(1))
    # create2arr: names added via create("NAME"), excluding commented-out lines
    m = re.search(r"create2arr\s*\(\s*\)\s*\{(.*?)\n  \}", src, flags=re.S)
    body = re.sub(r"//[^\n]*", "", m.group(1)) if m else ""
    passing = re.findall(r'create\(\s*"([^"]+)"\s*\)', body)
    return registered, passing


def main():
    entries = []
    for fam in FAMILY_DIRS:
        d = os.path.join(REF, fam)
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".java") or fn in BASE_CLASSES:
                continue
            e = extract(os.path.join(d, fn))
            e["family"] = fam
            entries.append(e)
            print(f"  {e['name']:<22} taps={len(e['dec_lo'])}")
    registered, passing = builder_metadata()
    entries.sort(key=lambda e: (e["family"], len(e["dec_lo"]), e["name"]))

    with open(os.path.abspath(OUT), "w") as f:
        f.write('"""Discrete wavelet filter-bank coefficient tables (GENERATED — do not edit).\n\n')
        f.write("Generated by tools/extract_filters.py from the reference's constructor\n")
        f.write("constants (reference: src/main/java/jwave/transforms/wavelets/*/*.java).\n")
        f.write("Coefficients are mathematical constants shared with PyWavelets.\n\n")
        f.write("Convention: ``dec_lo[j]`` multiplies ``x[(2i+j) mod h]`` in the analysis\n")
        f.write("butterfly (reference Wavelet.java:236-260); ``rec_lo``/``rec_hi`` are the\n")
        f.write("synthesis filters of the adjoint butterfly (Wavelet.java:277-303).\n")
        f.write('"""\n\n')
        f.write("# name -> dict(family, transform_wavelength, dec_lo, dec_hi, rec_lo, rec_hi,\n")
        f.write("#               recon_gain, in_builder, junit_passing)\n")
        f.write("FILTERS = {\n")
        passing_names = set(passing)
        for e in entries:
            f.write(f"    {e['name']!r}: {{\n")
            f.write(f"        'family': {e['family']!r},\n")
            f.write(f"        'transform_wavelength': {e['transform_wavelength']},\n")
            for key in ("dec_lo", "dec_hi", "rec_lo", "rec_hi"):
                vals = ", ".join(repr(v) for v in e[key])
                f.write(f"        {key!r}: [{vals}],\n")
            f.write(f"        'recon_gain': {e['recon_gain']!r},\n")
            f.write(f"        'in_builder': {e['name'] in registered},\n")
            f.write(f"        'junit_passing': {e['name'] in passing_names},\n")
            f.write("    },\n")
        f.write("}\n")
    print(f"\nwrote {len(entries)} filter banks -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    sys.exit(main())

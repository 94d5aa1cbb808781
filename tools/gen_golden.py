#!/usr/bin/env python3
"""Generate bit-exact golden vectors by compiling and running the reference
C++ simulator (expected at /root/reference; override with QUBLAS_REF).

The emitted goldens are checked into ``tests/golden_data/`` so the test suite
never needs the reference or a C++ toolchain.  No reference code is copied —
this tool *links against* the reference header the way any user program
would, purely as a test oracle.

Usage:  python tools/gen_golden.py [outdir]
"""

import json
import pathlib
import random
import subprocess
import sys
import tempfile

REF = pathlib.Path(__import__("os").environ.get("QUBLAS_REF", "/root/reference"))
ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "tests" / "golden_data"

RMODES = {
    "RND::POS_INF": 0, "RND::NEG_INF": 1, "RND::ZERO": 2,
    "RND::INF": 3, "RND::CONV": 4, "TRN::TCPL": 5, "TRN::SMGN": 6,
}
OMODES = {
    "SAT::TCPL": 0, "SAT::ZERO": 1, "SAT::SMGN": 2, "WRP::TCPL": 3,
    "WRP::TCPL_SAT<0>": 4,  # identity stub + machine-word wrap at the store
}

rng = random.Random(20260816)


def qu(i, f, s=True, rm="TRN::TCPL", om="SAT::TCPL"):
    return (f"Qu<intBits<{i}>, fracBits<{f}>, isSigned<{str(s).lower()}>, "
            f"QuMode<{rm}>, OfMode<{om}>>")


def fmt_json(i, f, s, rm, om):
    return [i, f, 1 if s else 0, RMODES[rm], OMODES[om]]


def raw_range(i, f):
    w = 1 + i + f
    return -(1 << (w - 1)), (1 << (w - 1)) - 1


def sample_raws(i, f, n=64, exhaustive_limit=10):
    lo, hi = raw_range(i, f)
    # Qu::fill(int) takes a C int, so sampled raws must fit 31 bits; wide
    # formats still exercise the multiword limb machinery via their storage
    lo = max(lo, -(1 << 31) + 1)
    hi = min(hi, (1 << 31) - 1)
    w = 1 + i + f
    span = hi - lo + 1
    if w <= exhaustive_limit or span <= n:
        return list(range(lo, hi + 1))
    vals = {lo, lo + 1, -1, 0, 1, hi - 1, hi, lo // 2, hi // 2}
    while len(vals) < n:
        vals.add(rng.randint(lo, hi))
    return sorted(vals)


chunks = []   # C++ statements
records = {}  # file -> list of record dicts (filled at runtime by parsing)
uid = 0


def emit(code):
    chunks.append(code)


def arr(vals):
    return "{" + ",".join(str(v) + "LL" for v in vals) + "}"


# ---------------------------------------------------------------- requant
requant_configs = []
# exhaustive over source storage for every mode combo
for rm in RMODES:
    for om in OMODES:
        requant_configs.append(((4, 4, True), (2, 1, True, rm, om)))
        requant_configs.append(((4, 4, True), (1, 2, False, rm, om)))
    # WRP::TCPL_SAT with values far beyond the target width: exercises the
    # machine-word wrap at the store (int32 for storage <= 32)
    requant_configs.append(((20, 10, True), (3, 2, True, rm,
                                             "WRP::TCPL_SAT<0>")))
# widening, negative frac/int bits, asymmetric
for rm in RMODES:
    requant_configs.append(((3, 2, True), (6, 7, True, rm, "SAT::TCPL")))
    requant_configs.append(((6, -3, True), (2, 1, True, rm, "SAT::ZERO")))
    requant_configs.append(((-2, 6, True), (-1, 3, True, rm, "SAT::TCPL")))
    requant_configs.append(((8, 8, True), (4, 2, True, rm, "WRP::TCPL")))
    requant_configs.append(((10, 10, True), (3, 3, False, rm, "SAT::ZERO")))
    requant_configs.append(((12, 0, True), (4, 4, True, rm, "SAT::SMGN")))
    # multiword (>64-bit storage) sources: exercises the reference's
    # ArbiInt limb path (raws capped at +-2^52 — fill(int) routes through
    # the exact double ctor).  The reference's own High/Mid/Low oracle
    # tests cover the same territory (test/TRN, test/RND).
    requant_configs.append(((70, 70, True), (8, 8, True, rm, "SAT::TCPL")))
    requant_configs.append(((70, 70, True), (1, 1, True, rm, "SAT::TCPL")))
    requant_configs.append(((30, 90, True), (10, 10, True, rm, "SAT::ZERO")))

for (fi, ff, fs), to in requant_configs:
    ti, tf, ts, rm, om = to
    uid += 1
    vals = sample_raws(fi, ff)
    emit(f"""
{{
    using From = {qu(fi, ff, fs)};
    using To = {qu(ti, tf, ts, rm, om)};
    static const long long vals[] = {arr(vals)};
    out << "{{\\"kind\\":\\"requant\\",\\"from\\":{json.dumps(fmt_json(fi, ff, fs, 'TRN::TCPL', 'SAT::TCPL'))},"
        << "\\"to\\":{json.dumps(fmt_json(ti, tf, ts, rm, om))},\\"in\\":[";
    for (size_t k = 0; k < {len(vals)}; ++k) out << vals[k] << (k + 1 < {len(vals)} ? "," : "");
    out << "],\\"out\\":[";
    for (size_t k = 0; k < {len(vals)}; ++k) {{
        From a; a.fill((int)vals[k]);
        To b = a;
        out << b.data.toString() << (k + 1 < {len(vals)} ? "," : "");
    }}
    out << "]}}\\n";
}}""")

# ---------------------------------------------------------------- binary ops
# NOTE: "div" is excluded — Qdiv is *uninstantiable* at this reference
# snapshot: `f2.data == 0` (QuBLAS.h:3252) has no viable operator== between
# ArbiInt and int (ArbiInt only defines ArbiInt-vs-ArbiInt comparisons,
# QuBLAS.h:1703-1834, and `explicit operator bool`), so any use of Qdiv
# fails to compile.  The reference's own tests never instantiate it.  Our
# qdiv implements the *written intent* of QuBLAS.h:3241-3266 (guarded
# div-by-zero -> 0, truncating quotient, saturate-only epilogue), verified
# against the host golden model instead.
op_configs = []
for op in ("mul", "add", "sub"):
    # same fmt, default merger
    op_configs.append((op, (4, 4, True), (4, 4, True), None))
    op_configs.append((op, (3, 2, True), (5, 6, True), None))
    op_configs.append((op, (4, 4, False), (4, 4, True), None))
    # explicit narrow output with each mode family
    for rm in ("TRN::TCPL", "RND::CONV", "RND::INF", "TRN::SMGN"):
        for om in ("SAT::TCPL", "SAT::ZERO", "WRP::TCPL"):
            op_configs.append((op, (4, 4, True), (4, 4, True),
                               (3, 2, True, rm, om)))
    op_configs.append((op, (6, -2, True), (3, 3, True),
                       (4, 1, True, "RND::POS_INF", "SAT::TCPL")))

OPNAME = {"mul": "Qmul", "add": "Qadd", "sub": "Qsub", "div": "Qdiv"}
for op, (i1, f1, s1), (i2, f2, s2), to in op_configs:
    uid += 1
    n = 48
    a_vals = sample_raws(i1, f1, n, exhaustive_limit=0)[:n]
    b_vals = sample_raws(i2, f2, n, exhaustive_limit=0)[:n]
    rng.shuffle(b_vals)
    # formats with tiny ranges return fewer than n values; keep lengths equal
    n_eff = min(len(a_vals), len(b_vals))
    while len(a_vals) < n:
        a_vals = (a_vals + a_vals)[:max(n_eff, n)]
    while len(b_vals) < n:
        b_vals = (b_vals + b_vals)[:max(n_eff, n)]
    a_vals, b_vals = a_vals[:n], b_vals[:n]
    tostr = "" if to is None else "<" + qu(*to) + ">"
    tojson = "null" if to is None else json.dumps(fmt_json(*to))
    emit(f"""
{{
    using A = {qu(i1, f1, s1)};
    using B = {qu(i2, f2, s2)};
    static const long long av[] = {arr(a_vals)};
    static const long long bv[] = {arr(b_vals)};
    out << "{{\\"kind\\":\\"{op}\\",\\"a\\":{json.dumps(fmt_json(i1, f1, s1, 'TRN::TCPL', 'SAT::TCPL'))},"
        << "\\"b\\":{json.dumps(fmt_json(i2, f2, s2, 'TRN::TCPL', 'SAT::TCPL'))},\\"to\\":{tojson},\\"ina\\":[";
    for (size_t k = 0; k < {len(a_vals)}; ++k) out << av[k] << (k + 1 < {len(a_vals)} ? "," : "");
    out << "],\\"inb\\":[";
    for (size_t k = 0; k < {len(b_vals)}; ++k) out << bv[k] << (k + 1 < {len(b_vals)} ? "," : "");
    out << "],\\"out\\":[";
    bool first = true;
    for (size_t k = 0; k < {len(a_vals)}; ++k) {{
        A a; a.fill((int)av[k]);
        B b; b.fill((int)bv[k]);
        auto c = {OPNAME[op]}{tostr}(a, b);
        if (!first) out << ","; first = false;
        out << c.data.toString();
    }}
    using ResT = decltype({OPNAME[op]}{tostr}(A(), B()));
    out << "],\\"res_fmt\\":[" << ResT::intB << "," << ResT::fracB << ","
        << (ResT::isS ? 1 : 0) << "," << ResT::QuM << "," << ResT::OfM << "]}}\\n";
}}""")

# ---------------------------------------------------------------- unary / compare
unary_configs = [(4, 4, True), (3, 5, True), (6, -2, True), (4, 4, False),
                 (-2, 6, True)]
for i1, f1, s1 in unary_configs:
    uid += 1
    vals = sample_raws(i1, f1, 32, exhaustive_limit=0)[:32]
    emit(f"""
{{
    using A = {qu(i1, f1, s1)};
    static const long long av[] = {arr(vals)};
    out << "{{\\"kind\\":\\"unary\\",\\"a\\":{json.dumps(fmt_json(i1, f1, s1, 'TRN::TCPL', 'SAT::TCPL'))},\\"in\\":[";
    for (size_t k = 0; k < {len(vals)}; ++k) out << av[k] << (k + 1 < {len(vals)} ? "," : "");
    out << "],\\"abs\\":[";
    for (size_t k = 0; k < {len(vals)}; ++k) {{
        A a; a.fill((int)av[k]);
        auto r = Qabs(a);
        out << r.data.toString() << (k + 1 < {len(vals)} ? "," : "");
    }}
    {{
        A a0; a0.fill((int)av[0]);
        auto r0 = Qabs(a0); auto n0 = Qneg(a0);
        using RA = decltype(r0); using RN = decltype(n0);
        out << "],\\"abs_fmt\\":[" << RA::intB << "," << RA::fracB << "," << (RA::isS?1:0) << "," << RA::QuM << "," << RA::OfM << "]"
            << ",\\"neg_fmt\\":[" << RN::intB << "," << RN::fracB << "," << (RN::isS?1:0) << "," << RN::QuM << "," << RN::OfM << "],\\"neg\\":[";
    }}
    for (size_t k = 0; k < {len(vals)}; ++k) {{
        A a; a.fill((int)av[k]);
        auto r = Qneg(a);
        out << r.data.toString() << (k + 1 < {len(vals)} ? "," : "");
    }}
    out << "]}}\\n";
}}""")

cmp_configs = [((4, 4, True), (3, 6, True)), ((4, 4, True), (4, 4, True)),
               ((6, -2, True), (2, 3, True))]
for (i1, f1, s1), (i2, f2, s2) in cmp_configs:
    uid += 1
    a_vals = sample_raws(i1, f1, 24, exhaustive_limit=0)[:24]
    b_vals = sample_raws(i2, f2, 24, exhaustive_limit=0)[:24]
    n_c = min(len(a_vals), len(b_vals))
    a_vals, b_vals = a_vals[:n_c], b_vals[:n_c]
    emit(f"""
{{
    using A = {qu(i1, f1, s1)};
    using B = {qu(i2, f2, s2)};
    static const long long av[] = {arr(a_vals)};
    static const long long bv[] = {arr(b_vals)};
    out << "{{\\"kind\\":\\"cmp\\",\\"a\\":{json.dumps(fmt_json(i1, f1, s1, 'TRN::TCPL', 'SAT::TCPL'))},"
        << "\\"b\\":{json.dumps(fmt_json(i2, f2, s2, 'TRN::TCPL', 'SAT::TCPL'))},\\"ina\\":[";
    for (size_t k = 0; k < {n_c}; ++k) out << av[k] << (k + 1 < {n_c} ? "," : "");
    out << "],\\"inb\\":[";
    for (size_t k = 0; k < {n_c}; ++k) out << bv[k] << (k + 1 < {n_c} ? "," : "");
    out << "],\\"cmp\\":[";
    for (size_t k = 0; k < {n_c}; ++k) {{
        A a; a.fill((int)av[k]);
        B b; b.fill((int)bv[k]);
        auto c = (a <=> b);
        int v = c < 0 ? -1 : (c > 0 ? 1 : 0);
        out << v << (k + 1 < {n_c} ? "," : "");
    }}
    out << "],\\"eq\\":[";
    for (size_t k = 0; k < {n_c}; ++k) {{
        A a; a.fill((int)av[k]);
        B b; b.fill((int)bv[k]);
        out << (Qeq(a, b) ? 1 : 0) << (k + 1 < {n_c} ? "," : "");
    }}
    out << "]}}\\n";
}}""")

# ---------------------------------------------------------------- reduce
reduce_configs = []
for n in (2, 3, 4, 5, 6, 7, 8, 9):
    reduce_configs.append((n, (4, 4, True), []))                   # no types
    reduce_configs.append((n, (4, 4, True), [(4, 2, True, "TRN::TCPL", "SAT::TCPL")]))
    reduce_configs.append((n, (4, 4, True),
                           [(5, 3, True, "RND::CONV", "SAT::ZERO"),
                            (4, 1, True, "TRN::TCPL", "SAT::TCPL")]))
    reduce_configs.append((n, (3, 0, True), [(3, 0, True, "TRN::TCPL", "SAT::TCPL")]))

for n, (i, f, s), layers in reduce_configs:
    uid += 1
    vals = [rng.randint(*raw_range(i, f)) for _ in range(n)]
    tl = ("" if not layers
          else "TypeList<" + ", ".join(qu(*l) for l in layers) + ">")
    tlj = json.dumps([fmt_json(*l) for l in layers])
    for variant in ("vec", "args"):
        if variant == "vec":
            fill = "".join(f"t[{k}].fill((int){v}); " for k, v in enumerate(vals))
            call = f"Qreduce<{tl}>(t)" if layers else "Qreduce(t)"
            setup = f"Qu<dim<{n}>, E> t; {fill}"
        else:
            decls = "".join(
                f"E e{k}; e{k}.fill((int){v}); " for k, v in enumerate(vals))
            argl = ", ".join(f"e{k}" for k in range(n))
            call = f"Qreduce<{tl}>({argl})" if layers else f"Qreduce({argl})"
            setup = decls
        emit(f"""
{{
    using E = {qu(i, f, s)};
    {setup}
    auto r = {call};
    using ResT = decltype(r);
    out << "{{\\"kind\\":\\"reduce\\",\\"variant\\":\\"{variant}\\",\\"elem\\":{json.dumps(fmt_json(i, f, s, 'TRN::TCPL', 'SAT::TCPL'))},"
        << "\\"layers\\":{tlj},\\"in\\":{json.dumps(vals)},\\"out\\":" << r.data.toString()
        << ",\\"res_fmt\\":[" << ResT::intB << "," << ResT::fracB << ","
        << (ResT::isS ? 1 : 0) << "," << ResT::QuM << "," << ResT::OfM << "]}}\\n";
}}""")

# ---------------------------------------------------------------- complex mul
cplx_configs = [
    # (algorithm, re fmt, im fmt, tag fmt or None)
    ("default", (4, 4, True), (4, 4, True), None),
    ("basic", (4, 4, True), (3, 5, True), (4, 3, True, "RND::CONV", "SAT::ZERO")),
    ("tf", (4, 4, True), (4, 4, True), None),
    ("tf", (4, 4, True), (3, 5, True), (5, 3, True, "TRN::TCPL", "SAT::TCPL")),
    ("tf_ba_quirk", (4, 4, True), (4, 4, True), (2, 2, True, "TRN::TCPL", "SAT::TCPL")),
    # NOTE: a single ::list-bearing tag (e.g. BasicComplexMul<acT<t>> or
    # TFComplexMul<abT<t>>) is UNINSTANTIABLE in the reference: the
    # tagExtractor single-param match unwraps the payload to a bare Qu_s,
    # and `Qu_s::list` does not exist (QuBLAS.h:3429).  Only baT — extracted
    # without ::list — works as a single TF tag.  Our Python API generalizes
    # the single-tag fallback to those cases as a documented extension.
    # two tags: no fallback; untagged steps use default inference
    ("tf_two", (4, 4, True), (4, 4, True), (3, 2, True, "TRN::TCPL", "SAT::TCPL")),
]
for algo, re_f, im_f, tagf in cplx_configs:
    uid += 1
    a_re = [rng.randint(*raw_range(re_f[0], re_f[1])) for _ in range(16)]
    a_im = [rng.randint(*raw_range(im_f[0], im_f[1])) for _ in range(16)]
    b_re = [rng.randint(*raw_range(re_f[0], re_f[1])) for _ in range(16)]
    b_im = [rng.randint(*raw_range(im_f[0], im_f[1])) for _ in range(16)]
    if algo == "default":
        callexpr, tagsj = "Qmul(c1, c2)", "null"
    elif algo == "basic":
        t = qu(*tagf)
        callexpr = (f"Qmul<BasicComplexMul<acT<{t}>, bdT<{t}>, adT<{t}>, "
                    f"bcT<{t}>, acbdT<{t}>, adbcT<{t}>>>(c1, c2)")
        tagsj = json.dumps(fmt_json(*tagf))
    elif algo == "tf" and tagf is None:
        callexpr, tagsj = "Qmul<TFComplexMul<>>(c1, c2)", "null"
    elif algo == "tf":
        t = qu(*tagf)
        callexpr = (f"Qmul<TFComplexMul<abT<{t}>, cdT<{t}>, abcT<{t}>, "
                    f"cdbT<{t}>, badT<{t}>, ABT<{t}>, BCT<{t}>>>(c1, c2)")
        tagsj = json.dumps(fmt_json(*tagf))
    elif algo == "tf_ba_quirk":
        # single baT: applies to its own step AND becomes the fallback for
        # every other step (tagExtractor single-payload strip)
        t = qu(*tagf)
        callexpr = f"Qmul<TFComplexMul<baT<{t}>>>(c1, c2)"
        tagsj = json.dumps(fmt_json(*tagf))
    else:  # tf_two: two tags -> no single-tag fallback
        t = qu(*tagf)
        callexpr = f"Qmul<TFComplexMul<abT<{t}>, ABT<{t}>>>(c1, c2)"
        tagsj = json.dumps(fmt_json(*tagf))
    emit(f"""
{{
    using Re = {qu(*re_f)};
    using Im = {qu(*im_f)};
    using C = Qcomplex<Re, Im>;
    static const long long are[] = {arr(a_re)}; static const long long aim[] = {arr(a_im)};
    static const long long bre[] = {arr(b_re)}; static const long long bim[] = {arr(b_im)};
    out << "{{\\"kind\\":\\"cmul\\",\\"algo\\":\\"{algo}\\",\\"re\\":{json.dumps(fmt_json(*re_f, 'TRN::TCPL', 'SAT::TCPL'))},"
        << "\\"im\\":{json.dumps(fmt_json(*im_f, 'TRN::TCPL', 'SAT::TCPL'))},\\"tag\\":{tagsj},"
        << "\\"are\\":{json.dumps(a_re)},\\"aim\\":{json.dumps(a_im)},\\"bre\\":{json.dumps(b_re)},\\"bim\\":{json.dumps(b_im)},"
        << "\\"out_re\\":[";
    std::string res_fmt;
    for (int k = 0; k < 16; ++k) {{
        C c1; c1.real.fill((int)are[k]); c1.imag.fill((int)aim[k]);
        C c2; c2.real.fill((int)bre[k]); c2.imag.fill((int)bim[k]);
        auto r = {callexpr};
        out << r.real.data.toString() << (k < 15 ? "," : "");
        if (k == 0) {{
            using RR = decltype(r.real); using RI = decltype(r.imag);
            res_fmt = "[[" + std::to_string(RR::intB) + "," + std::to_string(RR::fracB) + ","
                + std::to_string(RR::isS ? 1 : 0) + "," + std::to_string(RR::QuM) + "," + std::to_string(RR::OfM) + "],["
                + std::to_string(RI::intB) + "," + std::to_string(RI::fracB) + ","
                + std::to_string(RI::isS ? 1 : 0) + "," + std::to_string(RI::QuM) + "," + std::to_string(RI::OfM) + "]]";
        }}
    }}
    out << "],\\"out_im\\":[";
    for (int k = 0; k < 16; ++k) {{
        C c1; c1.real.fill((int)are[k]); c1.imag.fill((int)aim[k]);
        C c2; c2.real.fill((int)bre[k]); c2.imag.fill((int)bim[k]);
        auto r = {callexpr};
        out << r.imag.data.toString() << (k < 15 ? "," : "");
    }}
    out << "],\\"res_fmt\\":" << res_fmt << "}}\\n";
}}""")

# ---------------------------------------------------------------- complex add/sub + real-complex
emit("""
{
    // complex add/sub realT/imagT tag semantics (QuBLAS.h:3549-3584).
    // NOTE: ANY single realT<t>/imagT<t> is uninstantiable — the matched
    // tag unwraps to the bare Qu_s which has no ::list (same D6 class as
    // single complex-multiply tags); only >=2 tags, the TypeList<Qu1,Qu2>
    // form, or no tags compile.
    using Re = Qu<intBits<4>, fracBits<4>, isSigned<true>>;
    using Im = Qu<intBits<3>, fracBits<5>, isSigned<true>>;
    using C = Qcomplex<Re, Im>;
    using t = Qu<intBits<3>, fracBits<2>, isSigned<true>, QuMode<RND::CONV>, OfMode<SAT::ZERO>>;
    using u = Qu<intBits<5>, fracBits<3>, isSigned<true>>;
    static const long long are[] = {100,-128,37,-1,0,127,-100,55};
    static const long long aim[] = {-200,255,-256,1,0,-255,200,-17};
    static const long long bre[] = {-50,100,-37,2,1,-127,99,-56};
    static const long long bim[] = {150,-255,255,-2,-1,254,-199,18};
    out << "{\\"kind\\":\\"caddsub\\",\\"are\\":[100,-128,37,-1,0,127,-100,55],\\"aim\\":[-200,255,-256,1,0,-255,200,-17],"
        << "\\"bre\\":[-50,100,-37,2,1,-127,99,-56],\\"bim\\":[150,-255,255,-2,-1,254,-199,18],"
        << "\\"add_two\\":[";
    for (int k2 = 0; k2 < 8; ++k2) {
        C c1; c1.real.fill((int)are[k2]); c1.imag.fill((int)aim[k2]);
        C c2; c2.real.fill((int)bre[k2]); c2.imag.fill((int)bim[k2]);
        auto s = Qadd<realT<t>, imagT<u>>(c1, c2);
        out << "[" << s.real.data.toString() << "," << s.imag.data.toString() << "]" << (k2 < 7 ? "," : "");
    }
    out << "],\\"sub_qu2\\":[";
    for (int k2 = 0; k2 < 8; ++k2) {
        C c1; c1.real.fill((int)are[k2]); c1.imag.fill((int)aim[k2]);
        C c2; c2.real.fill((int)bre[k2]); c2.imag.fill((int)bim[k2]);
        auto s = Qsub<t, u>(c1, c2);              // TypeList<Qu1,Qu2> form
        out << "[" << s.real.data.toString() << "," << s.imag.data.toString() << "]" << (k2 < 7 ? "," : "");
    }
    out << "],\\"add_none\\":[";
    for (int k2 = 0; k2 < 8; ++k2) {
        C c1; c1.real.fill((int)are[k2]); c1.imag.fill((int)aim[k2]);
        C c2; c2.real.fill((int)bre[k2]); c2.imag.fill((int)bim[k2]);
        auto s = Qadd(c1, c2);
        out << "[" << s.real.data.toString() << "," << s.imag.data.toString() << "]" << (k2 < 7 ? "," : "");
    }
    out << "]}\\n";
}
{
    // real x complex asymmetric quirks (QuBLAS.h:3600-3713): add passes the
    // imag part through untouched; real-complex sub negates via (0 - imag)
    using Rl = Qu<intBits<4>, fracBits<4>, isSigned<true>>;
    using Re = Qu<intBits<4>, fracBits<4>, isSigned<true>>;
    using Im = Qu<intBits<3>, fracBits<5>, isSigned<true>>;
    using C = Qcomplex<Re, Im>;
    using t = Qu<intBits<4>, fracBits<3>, isSigned<true>>;
    using u = Qu<intBits<5>, fracBits<2>, isSigned<true>>;
    static const long long rv[] = {100,-128,37,-1,0,127,-100,55};
    static const long long cre[] = {-50,100,-37,2,1,-127,99,-56};
    static const long long cim[] = {150,-255,255,-2,-1,254,-199,18};
    out << "{\\"kind\\":\\"realcomplex\\",\\"rv\\":[100,-128,37,-1,0,127,-100,55],"
        << "\\"cre\\":[-50,100,-37,2,1,-127,99,-56],\\"cim\\":[150,-255,255,-2,-1,254,-199,18],"
        << "\\"mul_two\\":[";
    for (int k2 = 0; k2 < 8; ++k2) {
        Rl r; r.fill((int)rv[k2]);
        C c; c.real.fill((int)cre[k2]); c.imag.fill((int)cim[k2]);
        auto p = Qmul<realT<t>, imagT<u>>(r, c);
        out << "[" << p.real.data.toString() << "," << p.imag.data.toString() << "]" << (k2 < 7 ? "," : "");
    }
    out << "],\\"add\\":[";
    for (int k2 = 0; k2 < 8; ++k2) {
        Rl r; r.fill((int)rv[k2]);
        C c; c.real.fill((int)cre[k2]); c.imag.fill((int)cim[k2]);
        auto p = Qadd<t>(r, c);
        out << "[" << p.real.data.toString() << "," << p.imag.data.toString() << "]" << (k2 < 7 ? "," : "");
    }
    out << "],\\"sub_rc\\":[";
    for (int k2 = 0; k2 < 8; ++k2) {
        Rl r; r.fill((int)rv[k2]);
        C c; c.real.fill((int)cre[k2]); c.imag.fill((int)cim[k2]);
        auto p = Qsub<t>(r, c);
        out << "[" << p.real.data.toString() << "," << p.imag.data.toString() << "]" << (k2 < 7 ? "," : "");
    }
    out << "],\\"sub_cr\\":[";
    for (int k2 = 0; k2 < 8; ++k2) {
        Rl r; r.fill((int)rv[k2]);
        C c; c.real.fill((int)cre[k2]); c.imag.fill((int)cim[k2]);
        auto p = Qsub<t>(c, r);
        out << "[" << p.real.data.toString() << "," << p.imag.data.toString() << "]" << (k2 < 7 ? "," : "");
    }
    out << "]}\\n";
}
""")

# ---------------------------------------------------------------- double->fixed
dbl_configs = [
    (8, 8, True, "TRN::TCPL", "SAT::TCPL"),
    (8, 8, True, "RND::CONV", "SAT::ZERO"),
    (70, 70, True, "TRN::TCPL", "SAT::TCPL"),
    (70, 70, True, "RND::INF", "SAT::TCPL"),
    (6, -3, True, "TRN::TCPL", "SAT::TCPL"),
    (-2, 6, True, "RND::POS_INF", "SAT::TCPL"),
    (3, 5, False, "RND::ZERO", "SAT::ZERO"),
    (1, 1, True, "RND::NEG_INF", "SAT::TCPL"),
    (30, 30, True, "TRN::SMGN", "SAT::TCPL"),
]
doubles = [0.0, 1.0, -1.0, 1.25, -1.25, 0.1, -0.1, 3.14159265358979,
           -2.718281828, 1e-8, -1e-8, 123456.789, -123456.789, 1.5, -1.5,
           0.015625, -0.015625, 255.9999, -256.0, 1e20, -1e20, 16.0,
           0.09375, 1.59375, 1.625, 1.375, 1.65625]
for cfg in dbl_configs:
    uid += 1
    emit(f"""
{{
    using T = {qu(*cfg)};
    static const double dv[] = {{{",".join(repr(d) for d in doubles)}}};
    out << "{{\\"kind\\":\\"dbl\\",\\"fmt\\":{json.dumps(fmt_json(*cfg))},\\"in\\":{json.dumps([repr(d) for d in doubles]).replace(chr(34), chr(92) + chr(34))},\\"out\\":[";
    for (size_t k = 0; k < {len(doubles)}; ++k) {{
        T a = dv[k];
        out << "\\"" << a.data.toString() << "\\"" << (k + 1 < {len(doubles)} ? "," : "");
    }}
    out << "]}}\\n";
}}""")

# ---------------------------------------------------------------- bitstream
emit("""
{
    // main.cpp demo: 2x3 Qu<5,0> tensor -> BitStream<r2l<1>, l2r> -> parse as
    // complex 3-vector (reference main.cpp:8-18)
    using fixed_type = Qu<intBits<5>, fracBits<0>>;
    using vec_type = Qu<dim<2, 3>, fixed_type>;
    using complex_vec_type = Qu<dim<3>, Qcomplex<fixed_type, fixed_type>>;
    vec_type v = {1, 2, 3, 4, 5, 6};
    std::string v_res = BitStream<r2l<1>, l2r>(v);
    auto z = BitStream<complex_vec_type, l2r, l2r>(v_res);
    out << "{\\"kind\\":\\"bitstream_demo\\",\\"str\\":\\"" << v_res << "\\",\\"parsed\\":[";
    for (int k = 0; k < 3; ++k) {
        out << "[" << z[k].real.data.toString() << "," << z[k].imag.data.toString() << "]" << (k < 2 ? "," : "");
    }
    out << "]}\\n";
}
{
    // readme.md:111-123 style: width-10 elements, r2l<3> tensor, r2l<2> elem
    using t1 = Qu<intBits<6>, fracBits<3>, isSigned<true>, OfMode<SAT::ZERO>>;
    using vec_t = Qu<dim<6>, t1>;
    vec_t v;
    static const int raws[] = {17, -250, 511, -512, 0, 303};
    for (int k = 0; k < 6; ++k) v[k].fill(raws[k]);
    std::string s = BitStream<r2l<3>, r2l<2>>(v);
    auto back = BitStream<vec_t, r2l<3>, r2l<2>>(s);
    out << "{\\"kind\\":\\"bitstream_r2l\\",\\"raws\\":[17,-250,511,-512,0,303],\\"str\\":\\"" << s << "\\",\\"back\\":[";
    for (int k = 0; k < 6; ++k) out << back[k].data.toString() << (k < 5 ? "," : "");
    out << "]}\\n";
}
{
    // scalar bitstream, l2r and r2l<1>
    using t1 = Qu<intBits<4>, fracBits<3>, isSigned<true>>;
    t1 a; a.fill(-37);
    out << "{\\"kind\\":\\"bitstream_scalar\\",\\"raw\\":-37,\\"l2r\\":\\"" << BitStream<l2r>(a)
        << "\\",\\"r2l1\\":\\"" << BitStream<r2l<1>>(a) << "\\"}\\n";
}
{
    // complex tensor serialization includes the "(re, im)" decoration
    using t1 = Qu<intBits<3>, fracBits<2>, isSigned<true>>;
    using cv = Qu<dim<2>, Qcomplex<t1, t1>>;
    cv v;
    v[0].real.fill(5); v[0].imag.fill(-3); v[1].real.fill(-32); v[1].imag.fill(31);
    out << "{\\"kind\\":\\"bitstream_complex\\",\\"str\\":\\"" << BitStream<l2r, l2r>(v) << "\\"}\\n";
}
""")

# ---------------------------------------------------------------- ANUS Qpoly / Qapprox
emit("""
{
    using t = Qu<intBits<4>, fracBits<8>, isSigned<true>>;
    // Qpoly<a0, a1, a2>(x) = a0 + x*(a1 + x*a2), each level quantized to the
    // level's leading coefficient type (QuBLAS.h:4836-4851)
    static constexpr t a0 = 0.5, a1 = -1.25, a2 = 0.75;
    out << "{\\"kind\\":\\"qpoly\\",\\"fmt\\":[4,8,1,5,0],\\"coeffs\\":[";
    out << a0.data.toString() << "," << a1.data.toString() << "," << a2.data.toString() << "],\\"in\\":[";
    static const long long xs[] = {-1024,-513,-256,-100,-1,0,1,100,256,513,1023};
    for (int k = 0; k < 11; ++k) out << xs[k] << (k < 10 ? "," : "");
    out << "],\\"out\\":[";
    for (int k = 0; k < 11; ++k) {
        t x; x.fill((int)xs[k]);
        auto r = ANUS::Qpoly<a0, a1, a2>(x);
        out << r.data.toString() << (k < 10 ? "," : "");
    }
    out << "]}\\n";
}
{
    using t = Qu<intBits<4>, fracBits<8>, isSigned<true>>;
    static constexpr t c0 = 1.0, c1 = 0.5, d0 = -1.0, d1 = 2.0;
    out << "{\\"kind\\":\\"qapprox\\",\\"fmt\\":[4,8,1,5,0],\\"in\\":[";
    static const long long xs[] = {-1024,-512,-256,-128,0,127,255,256,511,1023};
    for (int k = 0; k < 10; ++k) out << xs[k] << (k < 9 ? "," : "");
    out << "],\\"out\\":[";
    for (int k = 0; k < 10; ++k) {
        t x; x.fill((int)xs[k]);
        auto r = ANUS::Qapprox<ANUS::Segment<0.0, c0, c1>, ANUS::Segment<1.0, d0, d1>>(x);
        out << r.data.toString() << (k < 9 ? "," : "");
    }
    out << "]}\\n";
}
""")

# ------------------------------------------------------------------- fill
# Reference fill() random streams (mt19937 seed 1 + libstdc++
# uniform_int_distribution) — pins qublas_tpu/refrand.py bit-for-bit.
# gen.seed(1) restarts the global stream so this family is independent of
# chunk ordering (same state as reference program startup, QuBLAS.h:30).
#
# TOOLCHAIN GUARD (advisor r2): refrand.uniform_int replicates the
# libstdc++ >= 11 Lemire downscaling draw.  Regenerating these goldens
# against an older libstdc++ (scaling/rejection algorithm) or libc++ would
# silently produce a different stream and mass failures that look like
# refrand bugs — fail the *compile* loudly instead, and record the
# toolchain next to the emitted streams (golden_data/toolchain.json).
chunks.append(r"""
#if !defined(__GLIBCXX__) || !defined(_GLIBCXX_RELEASE) || _GLIBCXX_RELEASE < 11
#error "fill/shuffle goldens require libstdc++ >= 11: qublas_tpu/refrand.py replicates its Lemire uniform_int_distribution draw"
#endif
    out << "{\"kind\":\"toolchain\",\"glibcxx\":" << __GLIBCXX__
        << ",\"glibcxx_release\":" << _GLIBCXX_RELEASE
        << ",\"gnuc\":\"" << __GNUC__ << "." << __GNUC_MINOR__
        << "\",\"pins\":\"fill+shuffle mt19937/uniform_int/std::shuffle streams\"}\n";
""")
fill_widths = [8, 17, 32, 33, 64, 65, 100, 128, 200]
_fill_dumps = "\n".join(
    f"""    {{
        gen.seed(1);
        out << "{{\\"kind\\":\\"fill\\",\\"w\\":{w},\\"out\\":[";
        for (int k = 0; k < 12; ++k) {{
            ArbiInt<{w}> v; v.fill();
            out << '\\"' << v.toString() << '\\"' << (k < 11 ? "," : "");
        }}
        out << "]}}\\n";
    }}"""
    for w in fill_widths)
chunks.append(_fill_dumps)

# ---------------------------------------------------------------- shuffle
# std::shuffle(gen) permutation golden — pins refrand.reference_shuffle.
shuffle_ns = [2, 3, 5, 7, 12, 16, 33, 100]
_shuffle_dumps = "\n".join(
    f"""    {{
        gen.seed(1);
        Qu<dim<{n}>, Qu<intBits<8>, fracBits<8>>> t;
        for (int i = 0; i < {n}; ++i) t[i].fill(1000 + i);
        t.shuffle();
        out << "{{\\"kind\\":\\"shuffle\\",\\"n\\":{n},\\"out\\":[";
        for (int i = 0; i < {n}; ++i)
            out << t[i].data.toString() << (i < {n} - 1 ? "," : "");
        out << "]}}\\n";
    }}"""
    for n in shuffle_ns)
chunks.append(_shuffle_dumps)

# ---------------------------------------------------------------- build & run
cpp = (
    "#include \"QuBLAS.h\"\n#include <iostream>\n#include <fstream>\n"
    "#include <string>\nusing namespace QuBLAS;\n"
    "int main(int argc, char** argv) {\n"
    "    std::ofstream out(argv[1]);\n"
    + "\n".join(chunks)
    + "\n    return 0;\n}\n"
)

with tempfile.TemporaryDirectory() as td:
    src = pathlib.Path(td) / "golden.cpp"
    src.write_text(cpp)
    exe = pathlib.Path(td) / "golden"
    print(f"compiling {len(cpp)} bytes of generated C++ ...")
    san = __import__("os").environ.get("QUBLAS_GOLDEN_SAN", "0") == "1"
    flags = ["-O0"] + (["-fsanitize=address,undefined"] if san else [])
    subprocess.run(
        ["g++", "-std=c++23", f"-I{REF}/include", *flags, str(src),
         "-o", str(exe)],
        check=True,
    )
    raw_out = pathlib.Path(td) / "golden.jsonl"
    subprocess.run([str(exe), str(raw_out)], check=True)
    lines = raw_out.read_text().strip().split("\n")

OUT.mkdir(parents=True, exist_ok=True)
by_kind = {}
for line in lines:
    rec = json.loads(line)
    by_kind.setdefault(rec["kind"], []).append(rec)
for kind, recs in by_kind.items():
    path = OUT / f"{kind}.json"
    path.write_text(json.dumps(recs))
    print(f"wrote {path} ({len(recs)} records)")

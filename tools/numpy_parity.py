"""NumPy-surface parity audit: enumerate ``numpy``'s public callables and
report which have a same-named spartan_tpu counterpart.

The reference exposed a NumPy-compatible builtin surface
(SURVEY.md §2.1 builtins row); this tool measures how much of *modern*
NumPy's function namespace the rebuild covers, and prints the residual
so each sweep can close real gaps instead of guessing.

Usage:
    python tools/numpy_parity.py            # summary + missing list
    python tools/numpy_parity.py --md       # emit the docs/PARITY.md table
"""

from __future__ import annotations

import inspect
import sys

import numpy as np

# Names that are out of scope for a distributed array framework — not
# array computations (IO/printing/dtype machinery/error-state control),
# or numpy-internal.  Each exclusion states why.
EXCLUDED = {
    # printing / formatting / error state / config
    "array2string", "array_repr", "array_str", "base_repr", "binary_repr",
    "format_float_positional", "format_float_scientific", "get_printoptions",
    "set_printoptions", "printoptions", "geterr", "seterr", "geterrcall",
    "seterrcall", "errstate", "getbufsize", "setbufsize", "show_config",
    "show_runtime", "get_include", "info", "typename",
    # host file IO of text/bytes (framework has save/load/checkpoint)
    "fromfile", "fromstring", "frombuffer", "fromregex", "loadtxt",
    "savetxt", "genfromtxt", "load", "save", "savez", "savez_compressed",
    "lib", "memmap", "require", "DataSource",
    # dtype/scalar machinery, not array ops
    "dtype", "can_cast", "common_type", "min_scalar_type", "mintypecode",
    "obj2sctype", "promote_types", "result_type", "issubdtype",
    "isdtype", "iterable", "isscalar", "datetime_data", "datetime_as_string",
    "busday_count", "busday_offset", "is_busday", "busdaycalendar",
    "typecodes", "sctypeDict",
    # python-object / structured-array utilities
    "asanyarray", "ascontiguousarray", "asfortranarray", "asmatrix",
    "copyto", "putmask", "put", "put_along_axis", "place", "shares_memory",
    "may_share_memory", "byte_bounds", "getbuffer", "nested_iters",
    "fromfunction", "frompyfunc", "vectorize", "piecewise",
    "recarray", "record", "rec",
    # deprecated / niche aliases modern numpy keeps for compat
    "alltrue", "sometrue", "cumproduct", "product", "round_", "msort",
    "trapz", "in1d", "row_stack", "issubsctype", "set_string_function",
    "deprecate", "deprecate_with_doc", "disp", "safe_eval", "who",
    "mat", "bmat", "asfarray", "find_common_type", "maximum_sctype",
    "issctype", "sctype2char", "char", "chararray", "compare_chararrays",
    # iterator / low-level buffer machinery
    "nditer", "ndenumerate", "ndindex", "flatiter", "broadcast",
    "iinfo", "finfo", "ndim",  # ndim: trivially expr.ndim attribute
    "shape", "size",  # attributes on exprs
    "test",  # numpy's bundled test-suite runner
    "isnat",  # datetime machinery (no datetime64 arrays on device)
    "isfortran",  # host memory-layout predicate; XLA owns device layout
    # masked arrays: deliberate non-goal (documented in ARCHITECTURE.md);
    # boolean-mask indexing + where() cover the use cases
    "ma",
}

# spartan_tpu name differs from numpy's
RENAMES = {
    "amax": "amax", "amin": "amin",
}


def collect_numpy():
  names = []
  for n in dir(np):
    if n.startswith("_"):
      continue
    obj = getattr(np, n)
    if not callable(obj):
      continue
    if inspect.isclass(obj):
      continue
    names.append(n)
  return sorted(names)


def collect_spartan():
  import spartan_tpu as sp
  have = set()
  for n in dir(sp):
    if not n.startswith("_") and callable(getattr(sp, n, None)):
      have.add(n)
  # expr methods count (numpy funcs usually have method twins)
  from spartan_tpu.expr.base import Expr
  for n in dir(Expr):
    if not n.startswith("_"):
      have.add(n)
  return have


def submodule_parity():
  """Coverage of np.linalg / np.fft / np.random vs sp.linalg/fft/random."""
  import spartan_tpu as sp
  out = {}
  for modname, npmod, spmod in (
      ("linalg", np.linalg, sp.linalg),
      ("fft", np.fft, sp.fft),
      ("random", np.random, sp.random),
  ):
    np_names = sorted(
        n for n in dir(npmod)
        if not n.startswith("_") and n != "test"
        and callable(getattr(npmod, n))
        and not inspect.isclass(getattr(npmod, n)))
    if modname == "random":
      # legacy RandomState method soup: audit only the core sampling fns
      np_names = [n for n in np_names if n in {
          "rand", "randn", "randint", "random", "uniform", "normal",
          "standard_normal", "permutation", "choice", "shuffle", "seed",
          "exponential", "poisson", "binomial", "beta", "gamma"}]
    have = {n for n in dir(spmod) if not n.startswith("_")}
    missing = [n for n in np_names if n not in have]
    out[modname] = (len(np_names) - len(missing), len(np_names), missing)
  return out


# np.ndarray METHODS that are out of scope on an immutable lazy expr:
# memory-layout/view/IO machinery and in-place mutators (the functional
# forms exist: fill→full_like, put→.at[].set, sort-in-place→.sort() copy).
METHOD_EXCLUDED = {
    "byteswap", "dump", "dumps", "fill", "getfield", "setfield",
    "setflags", "put", "tobytes", "tofile", "tostring", "view",
    "to_device", "itemset", "newbyteorder",
}


def method_parity():
  """Coverage of np.ndarray's callable methods on the Expr class."""
  from spartan_tpu.expr.base import Expr
  nd = [n for n in dir(np.ndarray)
        if not n.startswith("_") and callable(getattr(np.ndarray, n))]
  in_scope = [n for n in nd if n not in METHOD_EXCLUDED]
  have = set(dir(Expr))
  missing = [n for n in in_scope if n not in have]
  return len(in_scope) - len(missing), len(in_scope), missing


def main(argv):
  np_names = collect_numpy()
  have = collect_spartan()
  in_scope = [n for n in np_names if n not in EXCLUDED]
  missing = [n for n in in_scope if n not in have and
             RENAMES.get(n, n) not in have]
  covered = len(in_scope) - len(missing)
  subs = submodule_parity()

  if "--md" in argv:
    print("# NumPy surface parity\n")
    print(f"Audited against numpy {np.__version__} "
          f"(`tools/numpy_parity.py`).\n")
    print("| namespace | covered | of (in scope) | missing |")
    print("|---|---|---|---|")
    miss_str = " ".join(f"`{m}`" for m in missing) or "—"
    print(f"| `np.*` top level | {covered} | {len(in_scope)} | {miss_str} |")
    for mod, (c, t, miss) in subs.items():
      ms = " ".join(f"`{m}`" for m in miss) or "—"
      print(f"| `np.{mod}` | {c} | {t} | {ms} |")
    mc, mt, mmiss = method_parity()
    mms = " ".join(f"`{m}`" for m in mmiss) or "—"
    print(f"| `np.ndarray` methods (on `Expr`) | {mc} | {mt} | {mms} |")
    print(f"\n{len(EXCLUDED)} numpy names are excluded as out of scope "
          "(printing/IO/dtype machinery/deprecated aliases/masked arrays) "
          "— the exclusion list with reasons is in the tool source.")
  else:
    print(f"numpy {np.__version__}: {len(np_names)} public callables, "
          f"{len(in_scope)} in scope")
    print(f"covered: {covered}/{len(in_scope)} "
          f"({100.0 * covered / len(in_scope):.1f}%)")
    print(f"missing ({len(missing)}): {' '.join(missing)}")
    for mod, (c, t, miss) in subs.items():
      print(f"np.{mod}: {c}/{t} covered; missing: {' '.join(miss) or '—'}")
    mc, mt, mmiss = method_parity()
    print(f"np.ndarray methods: {mc}/{mt} covered; "
          f"missing: {' '.join(mmiss) or '—'}")
  return 0


if __name__ == "__main__":
  sys.exit(main(sys.argv[1:]))

"""``sp.io`` — the scipy.io surface (host boundary by nature).

File IO is inherently host work; every reader/writer re-exports
through the once-per-process-notice wrapper.  The framework glue:
``mmread`` returns a lazy ``SparseArray`` for sparse MatrixMarket
files (dense files return a lazy device array), and the writers
(``mmwrite``/``savemat``/``hb_write``) accept lazy Exprs and
``SparseArray``s (glommed once at the boundary).

Reference parity: the spartan reference ships per-shard .npy
checkpoint IO (ours: ``sp.save``/``sp.load``); scipy-format IO is a
beyond-parity surface (SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import scipy.io as _sio
import scipy.sparse as _ss

import spartan_tpu as sp
from spartan_tpu.expr.base import Expr
from spartan_tpu.util import log_info

# error/format classes and the handle classes re-export verbatim
from scipy.io import (  # noqa: F401
    FortranEOFError, FortranFile, FortranFormattingError, netcdf_file,
    netcdf_variable)
# submodules users reach through scipy.io (wavfile.read etc.)
from scipy.io import arff, matlab, wavfile  # noqa: F401

_host_noticed = set()


def _host_notice(name):
  if name in _host_noticed:
    return
  _host_noticed.add(name)
  log_info("sp.io.%s: file IO — runs EAGERLY on the host (scipy.io).",
           name)


def _concretize(v):
  """Lazy Expr / SparseArray -> host value for the writers."""
  from spartan_tpu.backend import sparse as _bs
  if isinstance(v, _bs.SparseArray):
    return v.to_scipy() if hasattr(v, "to_scipy") else v.tocsr()
  if isinstance(v, Expr):
    return np.asarray(sp.lazify(v).glom())
  if isinstance(v, dict):
    return {k: _concretize(x) for k, x in v.items()}
  return v


def loadmat(file_name, mdict=None, appendmat=True, **kwargs):
  _host_notice("loadmat")
  return _sio.loadmat(file_name, mdict=mdict, appendmat=appendmat,
                      **kwargs)


def savemat(file_name, mdict, appendmat=True, format="5",
            long_field_names=False, do_compression=False,
            oned_as="row"):
  _host_notice("savemat")
  return _sio.savemat(file_name, _concretize(mdict),
                      appendmat=appendmat, format=format,
                      long_field_names=long_field_names,
                      do_compression=do_compression, oned_as=oned_as)


def whosmat(file_name, appendmat=True, **kwargs):
  _host_notice("whosmat")
  return _sio.whosmat(file_name, appendmat=appendmat, **kwargs)


def mmread(source, *, spmatrix=True):
  """MatrixMarket reader: sparse files land as a lazy ``SparseArray``
  (device-ready), dense files as a lazy device array."""
  _host_notice("mmread")
  m = _sio.mmread(source)
  if _ss.issparse(m):
    from spartan_tpu.backend import sparse as _bs
    return _bs.from_scipy(m.tocsr())
  return sp.lazify(np.asarray(m))


def mmwrite(target, a, comment=None, field=None, precision=None,
            symmetry="AUTO"):
  _host_notice("mmwrite")
  a = _concretize(a)
  return _sio.mmwrite(target, a, comment=comment, field=field,
                      precision=precision, symmetry=symmetry)


def mminfo(source):
  _host_notice("mminfo")
  return _sio.mminfo(source)


def hb_read(path_or_open_file):
  _host_notice("hb_read")
  m = _sio.hb_read(path_or_open_file)
  from spartan_tpu.backend import sparse as _bs
  return _bs.from_scipy(m.tocsr())


def hb_write(path_or_open_file, m, hb_info=None):
  _host_notice("hb_write")
  m = _concretize(m)
  if not _ss.issparse(m):
    m = _ss.csc_matrix(np.asarray(m))
  return _sio.hb_write(path_or_open_file, m, hb_info=hb_info)


def readsav(file_name, idict=None, python_dict=False,
            uncompressed_file_name=None, verbose=False):
  _host_notice("readsav")
  return _sio.readsav(file_name, idict=idict, python_dict=python_dict,
                      uncompressed_file_name=uncompressed_file_name,
                      verbose=verbose)


_HOST_NAMES = [
    "FortranEOFError", "FortranFile", "FortranFormattingError",
    "hb_read", "hb_write", "loadmat", "mminfo", "mmread", "mmwrite",
    "netcdf_file", "netcdf_variable", "readsav", "savemat", "whosmat",
]

__all__ = sorted(n for n in dir()
                 if not n.startswith("_") and n not in
                 ("annotations", "np", "sp", "Expr", "log_info"))

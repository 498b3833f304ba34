/* Native extent-geometry fast path.
 *
 * Role parity with the reference's Cython extent/serialization extensions
 * (SURVEY.md §2.2): rectangle intersection and overlap enumeration are
 * called O(tiles) per op by the partitioner when mapping extents to
 * shardings, and CSR merge combines many sparse partial updates at ingest.
 * Implemented against the CPython C API (no pybind11 in this image).
 *
 * Exposed functions:
 *   find_overlapping(extents, region) -> [(idx, (ul, lr)), ...]
 *       extents: list of ((ul...), (lr...)) int tuples, region likewise.
 *   intersect(a, b) -> (ul, lr) | None
 *   csr_merge(indptr_a, indices_a, data_a, indptr_b, indices_b, data_b,
 *             n_cols) -> (indptr, indices, data)
 *       Additive merge of two CSR matrices with sorted, deduplicated rows.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define MAX_RANK 8

static int
parse_coords(PyObject *tup, int64_t *out, Py_ssize_t *rank)
{
    if (!PyTuple_Check(tup)) {
        PyErr_SetString(PyExc_TypeError, "expected coordinate tuple");
        return -1;
    }
    Py_ssize_t n = PyTuple_GET_SIZE(tup);
    if (n > MAX_RANK) {
        PyErr_SetString(PyExc_ValueError, "rank too large");
        return -1;
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        out[i] = PyLong_AsLongLong(PyTuple_GET_ITEM(tup, i));
        if (out[i] == -1 && PyErr_Occurred())
            return -1;
    }
    *rank = n;
    return 0;
}

static PyObject *
coords_to_tuple(const int64_t *c, Py_ssize_t rank)
{
    PyObject *t = PyTuple_New(rank);
    if (!t) return NULL;
    for (Py_ssize_t i = 0; i < rank; i++) {
        PyObject *v = PyLong_FromLongLong(c[i]);
        if (!v) { Py_DECREF(t); return NULL; }
        PyTuple_SET_ITEM(t, i, v);
    }
    return t;
}

/* core rectangle intersection; returns 1 if non-empty */
static int
rect_intersect(const int64_t *aul, const int64_t *alr,
               const int64_t *bul, const int64_t *blr,
               int64_t *oul, int64_t *olr, Py_ssize_t rank)
{
    for (Py_ssize_t i = 0; i < rank; i++) {
        int64_t u = aul[i] > bul[i] ? aul[i] : bul[i];
        int64_t l = alr[i] < blr[i] ? alr[i] : blr[i];
        if (l <= u)
            return 0;
        oul[i] = u;
        olr[i] = l;
    }
    return 1;
}

static int
parse_extent(PyObject *pair, int64_t *ul, int64_t *lr, Py_ssize_t *rank)
{
    if (!PyTuple_Check(pair) || PyTuple_GET_SIZE(pair) != 2) {
        PyErr_SetString(PyExc_TypeError, "extent must be (ul, lr)");
        return -1;
    }
    Py_ssize_t r1, r2;
    if (parse_coords(PyTuple_GET_ITEM(pair, 0), ul, &r1) < 0)
        return -1;
    if (parse_coords(PyTuple_GET_ITEM(pair, 1), lr, &r2) < 0)
        return -1;
    if (r1 != r2) {
        PyErr_SetString(PyExc_ValueError, "ul/lr rank mismatch");
        return -1;
    }
    *rank = r1;
    return 0;
}

static PyObject *
ext_intersect(PyObject *self, PyObject *args)
{
    PyObject *a, *b;
    if (!PyArg_ParseTuple(args, "OO", &a, &b))
        return NULL;
    int64_t aul[MAX_RANK], alr[MAX_RANK], bul[MAX_RANK], blr[MAX_RANK];
    int64_t oul[MAX_RANK], olr[MAX_RANK];
    Py_ssize_t ra, rb;
    if (parse_extent(a, aul, alr, &ra) < 0) return NULL;
    if (parse_extent(b, bul, blr, &rb) < 0) return NULL;
    if (ra != rb) {
        PyErr_SetString(PyExc_ValueError, "rank mismatch");
        return NULL;
    }
    if (!rect_intersect(aul, alr, bul, blr, oul, olr, ra))
        Py_RETURN_NONE;
    PyObject *put = coords_to_tuple(oul, ra);
    PyObject *plt = coords_to_tuple(olr, ra);
    if (!put || !plt) { Py_XDECREF(put); Py_XDECREF(plt); return NULL; }
    return Py_BuildValue("(NN)", put, plt);
}

static PyObject *
ext_find_overlapping(PyObject *self, PyObject *args)
{
    PyObject *extents, *region;
    if (!PyArg_ParseTuple(args, "OO", &extents, &region))
        return NULL;
    if (!PyList_Check(extents)) {
        PyErr_SetString(PyExc_TypeError, "extents must be a list");
        return NULL;
    }
    int64_t rul[MAX_RANK], rlr[MAX_RANK];
    Py_ssize_t rank;
    if (parse_extent(region, rul, rlr, &rank) < 0)
        return NULL;

    PyObject *hits = PyList_New(0);
    if (!hits) return NULL;
    Py_ssize_t n = PyList_GET_SIZE(extents);
    for (Py_ssize_t i = 0; i < n; i++) {
        int64_t eul[MAX_RANK], elr[MAX_RANK], oul[MAX_RANK], olr[MAX_RANK];
        Py_ssize_t er;
        if (parse_extent(PyList_GET_ITEM(extents, i), eul, elr, &er) < 0) {
            Py_DECREF(hits);
            return NULL;
        }
        if (er != rank) {
            PyErr_SetString(PyExc_ValueError, "rank mismatch in extents");
            Py_DECREF(hits);
            return NULL;
        }
        if (rect_intersect(eul, elr, rul, rlr, oul, olr, rank)) {
            PyObject *put = coords_to_tuple(oul, rank);
            PyObject *plt = coords_to_tuple(olr, rank);
            if (!put || !plt) {
                Py_XDECREF(put); Py_XDECREF(plt); Py_DECREF(hits);
                return NULL;
            }
            PyObject *item = Py_BuildValue("(n(NN))", i, put, plt);
            if (!item || PyList_Append(hits, item) < 0) {
                Py_XDECREF(item); Py_DECREF(hits);
                return NULL;
            }
            Py_DECREF(item);
        }
    }
    return hits;
}

/* ------------------------------------------------------------------ */
/* CSR additive merge: C = A + B with sorted, deduplicated rows.       */
/* Inputs are Python lists/buffers of ints (indptr, indices) and       */
/* floats (data); rows assumed sorted by column (scipy canonical).     */
/* ------------------------------------------------------------------ */

typedef struct {
    int64_t *indptr;
    int64_t *indices;
    double  *data;
    Py_ssize_t n_rows;
    Py_ssize_t nnz;
} Csr;

static int
load_int_array(PyObject *obj, int64_t **out, Py_ssize_t *len)
{
    PyObject *seq = PySequence_Fast(obj, "expected a sequence of ints");
    if (!seq) return -1;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    int64_t *buf = (int64_t *)malloc(sizeof(int64_t) * (n ? n : 1));
    if (!buf) { Py_DECREF(seq); PyErr_NoMemory(); return -1; }
    for (Py_ssize_t i = 0; i < n; i++) {
        buf[i] = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(seq, i));
        if (buf[i] == -1 && PyErr_Occurred()) {
            free(buf); Py_DECREF(seq);
            return -1;
        }
    }
    Py_DECREF(seq);
    *out = buf;
    *len = n;
    return 0;
}

static int
load_double_array(PyObject *obj, double **out, Py_ssize_t *len)
{
    PyObject *seq = PySequence_Fast(obj, "expected a sequence of floats");
    if (!seq) return -1;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    double *buf = (double *)malloc(sizeof(double) * (n ? n : 1));
    if (!buf) { Py_DECREF(seq); PyErr_NoMemory(); return -1; }
    for (Py_ssize_t i = 0; i < n; i++) {
        buf[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(seq, i));
        if (buf[i] == -1.0 && PyErr_Occurred()) {
            free(buf); Py_DECREF(seq);
            return -1;
        }
    }
    Py_DECREF(seq);
    *out = buf;
    *len = n;
    return 0;
}

static PyObject *
ext_csr_merge(PyObject *self, PyObject *args)
{
    PyObject *oipa, *oia, *oda, *oipb, *oib, *odb;
    Py_ssize_t n_cols;
    if (!PyArg_ParseTuple(args, "OOOOOOn", &oipa, &oia, &oda, &oipb, &oib,
                          &odb, &n_cols))
        return NULL;

    Csr A = {0}, B = {0};
    Py_ssize_t la, lb, lda_, ldb_;
    PyObject *result = NULL;
    int64_t *out_indptr = NULL, *out_indices = NULL;
    double *out_data = NULL;

    if (load_int_array(oipa, &A.indptr, &la) < 0) goto done;
    if (load_int_array(oia, &A.indices, &A.nnz) < 0) goto done;
    if (load_double_array(oda, &A.data, &lda_) < 0) goto done;
    if (load_int_array(oipb, &B.indptr, &lb) < 0) goto done;
    if (load_int_array(oib, &B.indices, &B.nnz) < 0) goto done;
    if (load_double_array(odb, &B.data, &ldb_) < 0) goto done;
    if (la != lb || la < 1 || A.nnz != lda_ || B.nnz != ldb_) {
        PyErr_SetString(PyExc_ValueError, "inconsistent CSR inputs");
        goto done;
    }
    A.n_rows = la - 1;

    Py_ssize_t cap = A.nnz + B.nnz;
    out_indptr = (int64_t *)malloc(sizeof(int64_t) * la);
    out_indices = (int64_t *)malloc(sizeof(int64_t) * (cap ? cap : 1));
    out_data = (double *)malloc(sizeof(double) * (cap ? cap : 1));
    if (!out_indptr || !out_indices || !out_data) {
        PyErr_NoMemory();
        goto done;
    }

    Py_ssize_t k = 0;
    out_indptr[0] = 0;
    for (Py_ssize_t r = 0; r < A.n_rows; r++) {
        Py_ssize_t ia = A.indptr[r], ea = A.indptr[r + 1];
        Py_ssize_t ib = B.indptr[r], eb = B.indptr[r + 1];
        while (ia < ea || ib < eb) {             /* sorted two-way merge */
            int64_t ca = ia < ea ? A.indices[ia] : n_cols;
            int64_t cb = ib < eb ? B.indices[ib] : n_cols;
            if (ca < cb) {
                out_indices[k] = ca; out_data[k++] = A.data[ia++];
            } else if (cb < ca) {
                out_indices[k] = cb; out_data[k++] = B.data[ib++];
            } else {                              /* combiner: add */
                out_indices[k] = ca;
                out_data[k++] = A.data[ia++] + B.data[ib++];
            }
        }
        out_indptr[r + 1] = k;
    }

    {
        PyObject *pip = PyList_New(la);
        PyObject *pin = PyList_New(k);
        PyObject *pda = PyList_New(k);
        if (!pip || !pin || !pda) {
            Py_XDECREF(pip); Py_XDECREF(pin); Py_XDECREF(pda);
            goto done;
        }
        for (Py_ssize_t i = 0; i < la; i++)
            PyList_SET_ITEM(pip, i, PyLong_FromLongLong(out_indptr[i]));
        for (Py_ssize_t i = 0; i < k; i++) {
            PyList_SET_ITEM(pin, i, PyLong_FromLongLong(out_indices[i]));
            PyList_SET_ITEM(pda, i, PyFloat_FromDouble(out_data[i]));
        }
        result = Py_BuildValue("(NNN)", pip, pin, pda);
    }

done:
    free(A.indptr); free(A.indices); free(A.data);
    free(B.indptr); free(B.indices); free(B.data);
    free(out_indptr); free(out_indices); free(out_data);
    return result;
}

static PyMethodDef ExtMethods[] = {
    {"intersect", ext_intersect, METH_VARARGS,
     "intersect((ul,lr), (ul,lr)) -> (ul,lr) | None"},
    {"find_overlapping", ext_find_overlapping, METH_VARARGS,
     "find_overlapping([extents], region) -> [(idx, (ul,lr))]"},
    {"csr_merge", ext_csr_merge, METH_VARARGS,
     "additive CSR merge -> (indptr, indices, data)"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef extmodule = {
    PyModuleDef_HEAD_INIT, "_extent_c",
    "native extent geometry + CSR merge fast paths", -1, ExtMethods
};

PyMODINIT_FUNC
PyInit__extent_c(void)
{
    return PyModule_Create(&extmodule);
}

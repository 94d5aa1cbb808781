/* Fast Python-int <-> little-endian two's-complement limb marshalling.
 *
 * The native multiword engine (qublas_host.cpp) computes at ~50-300 ns per
 * element, but converting object-array Python ints to/from limb buffers
 * through `int.to_bytes` / `int.from_bytes` costs ~450 ns per CALL at the
 * Python level — the engine was conversion-bound (BASELINE.md round-2 note).
 * This CPython extension does the same conversion via the C API
 * (_PyLong_AsByteArray / _PyLong_FromByteArray), one C loop for the whole
 * batch.
 *
 * API:
 *   to_bytes(seq, nbytes)        -> bytes   (len(seq) * nbytes, LE signed)
 *   from_bytes(buf, n, nbytes)   -> list[int]  (signed, little-endian)
 *
 * A value that does not fit `nbytes` signed raises OverflowError, matching
 * int.to_bytes — callers treat that as "outside the engine envelope".
 *
 * Build: g++/gcc -O2 -shared -fPIC -I<python-include> fastlimbs.c
 * (no libpython link needed on Linux; symbols resolve at import).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

/* This file uses private CPython APIs (_PyLong_AsByteArray, _PyLong_Sign,
 * _PyLong_NumBits) whose signatures drift across versions:
 *   - 3.13 added a `with_exceptions` arg to _PyLong_AsByteArray (guarded
 *     below) and changed _PyLong_NumBits' return type to a signed 64-bit
 *     (-1 on error — the (size_t)-1 check below is bit-identical);
 *   - 3.14+ is NOT verified.  Fail the build explicitly there instead of
 *     miscompiling (ADVICE r3): the Python wrapper (qublas_tpu/native.py)
 *     treats a failed build as "extension unavailable" and falls back to
 *     pure-Python int.to_bytes marshalling, which is slower but exact.
 * When porting to 3.14+: prefer the public PyLong_AsNativeBytes /
 * PyLong_GetSign APIs added in 3.13/3.14. */
#if PY_VERSION_HEX < 0x03080000 || PY_VERSION_HEX >= 0x030E0000
#error "fastlimbs.c is pinned to CPython [3.8, 3.14): verify the private \
_PyLong_* API signatures for this version before raising the pin"
#endif

static PyObject *fl_to_bytes(PyObject *self, PyObject *args) {
    PyObject *seq;
    Py_ssize_t nbytes;
    if (!PyArg_ParseTuple(args, "On", &seq, &nbytes))
        return NULL;
    if (nbytes <= 0) {
        PyErr_SetString(PyExc_ValueError, "nbytes must be positive");
        return NULL;
    }
    PyObject *fast = PySequence_Fast(seq, "expected a sequence");
    if (!fast)
        return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * nbytes);
    if (!out) {
        Py_DECREF(fast);
        return NULL;
    }
    unsigned char *buf = (unsigned char *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *item = PySequence_Fast_GET_ITEM(fast, i); /* borrowed */
        PyObject *owned = NULL;
        if (!PyLong_Check(item)) {
            owned = PyNumber_Long(item);
            if (!owned)
                goto fail;
            item = owned;
        }
        int rc = _PyLong_AsByteArray((PyLongObject *)item,
                                     buf + i * nbytes, (size_t)nbytes,
                                     /*little_endian=*/1, /*is_signed=*/1
#if PY_VERSION_HEX >= 0x030D0000
                                     , /*with_exceptions=*/1
#endif
        );
        Py_XDECREF(owned);
        if (rc < 0)
            goto fail;
    }
    Py_DECREF(fast);
    return out;
fail:
    Py_DECREF(fast);
    Py_DECREF(out);
    return NULL;
}

static PyObject *fl_from_bytes(PyObject *self, PyObject *args) {
    Py_buffer view;
    Py_ssize_t n, nbytes;
    if (!PyArg_ParseTuple(args, "y*nn", &view, &n, &nbytes))
        return NULL;
    if (nbytes <= 0 || n < 0 || view.len < n * nbytes) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "buffer too small for n*nbytes");
        return NULL;
    }
    PyObject *out = PyList_New(n);
    if (!out) {
        PyBuffer_Release(&view);
        return NULL;
    }
    const unsigned char *buf = (const unsigned char *)view.buf;
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *v = _PyLong_FromByteArray(buf + i * nbytes,
                                            (size_t)nbytes,
                                            /*little_endian=*/1,
                                            /*is_signed=*/1);
        if (!v) {
            Py_DECREF(out);
            PyBuffer_Release(&view);
            return NULL;
        }
        PyList_SET_ITEM(out, i, v); /* steals */
    }
    PyBuffer_Release(&view);
    return out;
}

static PyObject *fl_max_bits(PyObject *self, PyObject *args) {
    /* max two's-complement width over a sequence of ints:
     * v >= 0 -> bit_length + 1;  v < 0 -> (~v).bit_length() + 1
     * (the same rule as qublas_tpu.native._value_bits). */
    PyObject *seq;
    if (!PyArg_ParseTuple(args, "O", &seq))
        return NULL;
    PyObject *fast = PySequence_Fast(seq, "expected a sequence");
    if (!fast)
        return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    size_t best = 1;
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *item = PySequence_Fast_GET_ITEM(fast, i); /* borrowed */
        PyObject *owned = NULL;
        if (!PyLong_Check(item)) {
            owned = PyNumber_Long(item);
            if (!owned)
                goto fail;
            item = owned;
        }
        PyObject *mag = item;
        PyObject *inv = NULL;
        if (_PyLong_Sign(item) < 0) {
            inv = PyNumber_Invert(item); /* ~v = -v-1 >= 0 */
            if (!inv) {
                Py_XDECREF(owned);
                goto fail;
            }
            mag = inv;
        }
        size_t bits = _PyLong_NumBits(mag);
        Py_XDECREF(inv);
        Py_XDECREF(owned);
        if (bits == (size_t)-1 && PyErr_Occurred())
            goto fail;
        if (bits + 1 > best)
            best = bits + 1;
    }
    Py_DECREF(fast);
    return PyLong_FromSize_t(best);
fail:
    Py_DECREF(fast);
    return NULL;
}

static PyMethodDef fl_methods[] = {
    {"to_bytes", fl_to_bytes, METH_VARARGS,
     "to_bytes(seq, nbytes) -> bytes: LE signed two's-complement pack"},
    {"from_bytes", fl_from_bytes, METH_VARARGS,
     "from_bytes(buf, n, nbytes) -> list[int]: LE signed unpack"},
    {"max_bits", fl_max_bits, METH_VARARGS,
     "max_bits(seq) -> int: max two's-complement width over the ints"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef fl_module = {
    PyModuleDef_HEAD_INIT, "qublas_fastlimbs",
    "Batched Python-int <-> limb-buffer conversion (C API)", -1,
    fl_methods};

PyMODINIT_FUNC PyInit_qublas_fastlimbs(void) {
    return PyModule_Create(&fl_module);
}

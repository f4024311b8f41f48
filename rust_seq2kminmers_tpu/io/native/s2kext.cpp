// CPython extension exposing the host HPC string kernels with zero
// intermediate copies (the ctypes path costs ~2 us per pointer conversion
// plus a tobytes+decode copy of the whole output; at reference-kernel
// speeds — ~4-6 GB/s, reference src/hpc.rs:44-147 publishes ~4 GB/s —
// that overhead dominates).
//
// One entry point:
//   rle(data, collapse_any, wide, want_pos) -> (str, ndarray | None)
//
// * `data`: str (latin-1 representable: read zero-copy from the compact
//   UCS1 buffer), bytes, bytearray, memoryview or any C-contiguous
//   buffer.
// * kept chars are compress-stored DIRECTLY into the result str's UCS1
//   buffer (allocated worst-case, shrunk in place afterwards — the same
//   pattern CPython's own codecs use).
// * positions go directly into a numpy int32 (wide=0) / int64 (wide=1)
//   array, also shrunk in place.
// * the GIL is released around the kernel, which goes two-phase parallel
//   above 4 MB (see rle_kernels.h).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <chrono>

#include "rle_kernels.h"

namespace {

struct Input {
  const uint8_t* data = nullptr;
  Py_ssize_t n = 0;
  Py_buffer view{};
  bool has_view = false;
  ~Input() {
    if (has_view) PyBuffer_Release(&view);
  }
};

int get_input(PyObject* obj, Input* in) {
  if (PyUnicode_Check(obj)) {
    if (PyUnicode_KIND(obj) != PyUnicode_1BYTE_KIND) {
      PyErr_SetString(PyExc_ValueError,
                      "str input must be latin-1 representable");
      return -1;
    }
    in->data = PyUnicode_1BYTE_DATA(obj);
    in->n = PyUnicode_GET_LENGTH(obj);
    return 0;
  }
  if (PyObject_GetBuffer(obj, &in->view, PyBUF_SIMPLE) != 0) return -1;
  in->has_view = true;
  in->data = static_cast<const uint8_t*>(in->view.buf);
  in->n = in->view.len;
  return 0;
}

PyObject* s2k_rle(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  if (nargs != 4) {
    PyErr_SetString(PyExc_TypeError,
                    "rle(data, collapse_any, wide, want_pos)");
    return nullptr;
  }
  PyObject* obj = args[0];
  long collapse_any = PyLong_AsLong(args[1]);
  long wide = PyLong_AsLong(args[2]);
  long want_pos = PyLong_AsLong(args[3]);
  if (PyErr_Occurred()) return nullptr;
  // Keep multi-10MB freed output buffers warm in the malloc arena: the
  // int64-position outputs otherwise exceed glibc's dynamic mmap
  // threshold and pay ~5 ms of fresh page faults per call (see
  // rle_kernels.h, "int64-position throughput").  Applied on first RLE
  // use — not at module import — so embedders that never touch the host
  // string kernels keep default allocator policy.
  s2k::rle_malloc_tune();
  Input in;
  if (get_input(obj, &in) != 0) return nullptr;

  if (in.n == 0) {
    PyObject* str = PyUnicode_New(0, 127);
    if (!str) return nullptr;
    if (!want_pos) return Py_BuildValue("(NO)", str, Py_None);
    npy_intp zero = 0;
    PyObject* arr =
        PyArray_SimpleNew(1, &zero, wide ? NPY_INT64 : NPY_INT32);
    if (!arr) {
      Py_DECREF(str);
      return nullptr;
    }
    return Py_BuildValue("(NN)", str, arr);
  }

  // Small inputs (< 1 MB): single pass into worst-case (n-sized) buffers,
  // shrink afterwards — the shrink copies are tiny and cheaper than a
  // second read.  Large inputs: count pass first for exact-size
  // allocations (no resize memcpy of multi-MB outputs; the parallel
  // >= 4 MB path needs the count pass anyway for per-chunk offsets).
  const bool count_first = in.n >= (1 << 20);
  s2k::RlePlan plan;
  int64_t m;
  if (count_first) {
    Py_BEGIN_ALLOW_THREADS;
    plan = s2k::rle_plan(in.data, in.n, collapse_any);
    Py_END_ALLOW_THREADS;
    m = plan.total;
  } else {
    m = in.n;  // worst case; shrunk below
  }

  PyObject* str = PyUnicode_New(m, 255);
  if (!str) return nullptr;
  uint8_t* out_chars = PyUnicode_1BYTE_DATA(str);

  PyArrayObject* arr = nullptr;
  void* out_pos = nullptr;
  if (want_pos) {
    npy_intp dim = m;
    arr = reinterpret_cast<PyArrayObject*>(
        PyArray_SimpleNew(1, &dim, wide ? NPY_INT64 : NPY_INT32));
    if (!arr) {
      Py_DECREF(str);
      return nullptr;
    }
    out_pos = PyArray_DATA(arr);
  }

  Py_BEGIN_ALLOW_THREADS;
  if (count_first) {
    if (wide)
      s2k::rle_store<int64_t>(plan, in.data, in.n, collapse_any, out_chars,
                              static_cast<int64_t*>(out_pos));
    else
      s2k::rle_store<int32_t>(plan, in.data, in.n, collapse_any, out_chars,
                              static_cast<int32_t*>(out_pos));
  } else if (wide) {
    m = s2k::rle_dispatch<int64_t>(in.data, in.n, collapse_any, out_chars,
                                   static_cast<int64_t*>(out_pos));
  } else {
    m = s2k::rle_dispatch<int32_t>(in.data, in.n, collapse_any, out_chars,
                                   static_cast<int32_t*>(out_pos));
  }
  Py_END_ALLOW_THREADS;

  if (m < in.n && !count_first) {
    if (PyUnicode_Resize(&str, m) != 0) {
      Py_XDECREF(arr);
      return nullptr;
    }
    if (arr) {
      npy_intp new_dim = m;
      PyArray_Dims nd{&new_dim, 1};
      PyObject* r = PyArray_Resize(arr, &nd, 1, NPY_CORDER);
      if (!r) {
        Py_DECREF(str);
        Py_DECREF(arr);
        return nullptr;
      }
      Py_DECREF(r);
    }
  }
  if (!want_pos) return Py_BuildValue("(NO)", str, Py_None);
  return Py_BuildValue("(NN)", str, reinterpret_cast<PyObject*>(arr));
}

PyObject* s2k_rle_loop(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  // rle_loop(data, collapse_any, wide, want_pos, min_ms) -> (iters, ns)
  //
  // Criterion-equivalent steady-state measurement: the kernel is invoked
  // repeatedly into preallocated worst-case buffers with the clock read
  // INSIDE native code, so the measured region contains zero Python/FFI
  // call overhead — the same methodology as the reference's criterion
  // harness, which iterates the Rust closure directly
  // (reference benches/bench.rs:36-49).  At 10 kB a single Python-level
  // call costs ~1-3 us of FFI + object construction against ~1-2 us of
  // kernel work; this entry separates the two.
  if (nargs != 5) {
    PyErr_SetString(PyExc_TypeError,
                    "rle_loop(data, collapse_any, wide, want_pos, min_ms)");
    return nullptr;
  }
  long collapse_any = PyLong_AsLong(args[1]);
  long wide = PyLong_AsLong(args[2]);
  long want_pos = PyLong_AsLong(args[3]);
  long min_ms = PyLong_AsLong(args[4]);
  if (PyErr_Occurred()) return nullptr;
  s2k::rle_malloc_tune();
  Input in;
  if (get_input(args[0], &in) != 0) return nullptr;
  if (in.n == 0) return Py_BuildValue("(ll)", 0L, 0L);

  uint8_t* out_chars = static_cast<uint8_t*>(malloc(in.n));
  void* out_pos =
      want_pos ? malloc(static_cast<size_t>(in.n) * (wide ? 8 : 4)) : nullptr;
  if (!out_chars || (want_pos && !out_pos)) {
    free(out_chars);
    free(out_pos);
    return PyErr_NoMemory();
  }

  int64_t iters = 0, ns = 0, sink = 0;
  Py_BEGIN_ALLOW_THREADS;
  auto run = [&]() -> int64_t {
    if (wide)
      return s2k::rle_dispatch<int64_t>(in.data, in.n, collapse_any,
                                        out_chars,
                                        static_cast<int64_t*>(out_pos));
    return s2k::rle_dispatch<int32_t>(in.data, in.n, collapse_any, out_chars,
                                      static_cast<int32_t*>(out_pos));
  };
  sink += run();  // warm (page-fault the scratch buffers once)
  const int64_t min_ns = static_cast<int64_t>(min_ms) * 1000000;
  auto t0 = std::chrono::steady_clock::now();
  do {
    sink += run() + out_chars[0];
    ++iters;
    ns = std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now() - t0)
             .count();
  } while (ns < min_ns);
  Py_END_ALLOW_THREADS;
  free(out_chars);
  free(out_pos);
  if (sink == -1) iters = -1;  // keep `sink` observable
  return Py_BuildValue("(LL)", static_cast<long long>(iters),
                       static_cast<long long>(ns));
}

PyObject* s2k_xcode(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  // xcode(data, table: buffer of >= 256 uint8) -> uint8 ndarray
  if (nargs != 2) {
    PyErr_SetString(PyExc_TypeError, "xcode(data, table)");
    return nullptr;
  }
  Input in, tab;
  if (get_input(args[0], &in) != 0) return nullptr;
  if (get_input(args[1], &tab) != 0) return nullptr;
  if (tab.n < 256) {
    PyErr_SetString(PyExc_ValueError, "table must hold 256 bytes");
    return nullptr;
  }
  npy_intp dim = in.n;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(1, &dim, NPY_UINT8));
  if (!arr) return nullptr;
  uint8_t* out = static_cast<uint8_t*>(PyArray_DATA(arr));
  Py_BEGIN_ALLOW_THREADS;
  s2k::xcode_dispatch(in.data, in.n, tab.data, out);
  Py_END_ALLOW_THREADS;
  return reinterpret_cast<PyObject*>(arr);
}

PyMethodDef kMethods[] = {
    {"rle", reinterpret_cast<PyCFunction>(s2k_rle), METH_FASTCALL,
     "rle(data, collapse_any, wide, want_pos) -> (str, ndarray|None)"},
    {"rle_loop", reinterpret_cast<PyCFunction>(s2k_rle_loop), METH_FASTCALL,
     "rle_loop(data, collapse_any, wide, want_pos, min_ms) -> (iters, ns); "
     "criterion-style in-native steady-state kernel loop"},
    {"xcode", reinterpret_cast<PyCFunction>(s2k_xcode), METH_FASTCALL,
     "xcode(data, table256) -> uint8 ndarray ((keep << 3) | code)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "s2kext",
    "native HPC string kernels (AVX-512 RLE compress)", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_s2kext(void) {
  import_array();
  return PyModule_Create(&kModule);
}

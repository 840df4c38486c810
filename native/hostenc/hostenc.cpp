// sicelore_hostenc — CPython extension for the host-side encode hot path.
//
// The pass-1/pass-2 device dispatch needs every fastq chunk turned into a
// fixed-shape 2-bit composite (head+tail splice) plus qual matrix; the
// numpy implementation (readscan.encode_composite_2bit) spends ~8us/read
// in per-read slicing — at 32k-read chunks that is the single largest
// host term of the scan budget (VERDICT r1 item 1).  This extension does
// the same transform with per-read memcpy + table lookups, multithreaded,
// and is byte-identical to the numpy path (asserted in
// tests/test_readscan.py::test_native_encode_matches_numpy).
//
// Reference role: the jar's FastqRecordExt/TwoBit encode stage inside
// WorkerReadscanner (binary; SURVEY §2.a "Barcode assigner" row).
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// byte -> 2-bit code; 0xFF marks non-ACGT (dirty)
uint8_t ENC[256];
struct EncInit {
  EncInit() {
    memset(ENC, 0xFF, sizeof(ENC));
    const char *u = "ACGT", *l = "acgt";
    for (int i = 0; i < 4; i++) {
      ENC[(uint8_t)u[i]] = (uint8_t)i;
      ENC[(uint8_t)l[i]] = (uint8_t)i;
    }
  }
} enc_init;

struct Span {
  const uint8_t *p;
  Py_ssize_t n;
};

// Fill one read's composite codes (4-bit, one byte per base, clamped the
// same way numpy's _ENC_PAD0 + np.minimum(codes, 3) does for packing) and
// quals; returns dirty flag.
inline bool encode_one(const Span &s, const Span &q, int edge, uint8_t *codes,
                       int8_t *qv, int32_t *comp_len, int32_t *true_len) {
  const int W = 2 * edge;
  const Py_ssize_t n = s.n;
  *true_len = (int32_t)n;
  const int cl = (int)(n < W ? n : W);
  *comp_len = cl;
  // composite layout: head = s[:edge]; tail = s[edge:W] (short) or
  // s[-edge:] (long); pad rest with code 3 (= what _ENC_PAD0 PAD clamps to)
  bool dirty = false;
  int head = (int)(n < edge ? n : edge);
  for (int i = 0; i < head; i++) {
    uint8_t c = ENC[s.p[i]];
    dirty |= (c == 0xFF);
    codes[i] = c & 3;
  }
  for (int i = head; i < edge; i++) codes[i] = 3;
  const uint8_t *tail_p = s.p + (n <= W ? edge : n - edge);
  int tail = cl - edge;  // < 0 when the read is shorter than edge
  for (int i = 0; i < tail; i++) {
    uint8_t c = ENC[tail_p[i]];
    dirty |= (c == 0xFF);
    codes[edge + i] = c & 3;
  }
  for (int i = (tail > 0 ? tail : 0); i < edge; i++) codes[edge + i] = 3;
  // quals: composite splice of q, phred = max(q-33, 0), 0 beyond the read
  Py_ssize_t qn = q.n;
  int qhead = (int)(qn < edge ? qn : edge);
  for (int i = 0; i < qhead; i++) {
    uint8_t c = q.p[i];
    qv[i] = (int8_t)(c >= 33 ? c - 33 : 0);
  }
  for (int i = qhead; i < edge; i++) qv[i] = 0;
  const uint8_t *qtail_p = q.p + (qn <= W ? edge : qn - edge);
  int qcl = (int)(qn < W ? qn : W);
  int qtail = qcl - edge;
  for (int i = 0; i < qtail; i++) {
    uint8_t c = qtail_p[i];
    qv[edge + i] = (int8_t)(c >= 33 ? c - 33 : 0);
  }
  for (int i = (qtail > 0 ? qtail : 0); i < edge; i++) qv[edge + i] = 0;
  return dirty;
}

inline void pack_2bit(const uint8_t *codes, int W, uint8_t *out) {
  for (int i = 0; i < W / 4; i++) {
    out[i] = (uint8_t)((codes[4 * i] << 6) | (codes[4 * i + 1] << 4) |
                       (codes[4 * i + 2] << 2) | codes[4 * i + 3]);
  }
}

int nthreads_for(Py_ssize_t b) {
  unsigned hw = std::thread::hardware_concurrency();
  int t = hw ? (int)hw : 4;
  if (t > 16) t = 16;
  Py_ssize_t per = 2048;  // don't spawn threads for tiny batches
  int need = (int)((b + per - 1) / per);
  return t < need ? t : (need > 0 ? need : 1);
}

// encode_composite_2bit(seqs: list[bytes], quals: list[bytes], edge: int)
// -> (packed, qv, comp_lens, true_lens, dirty, qsum) as bytes objects:
//    packed [B, edge/2] u8, qv [B, 2*edge] i8, comp/true_lens [B] i32,
//    dirty [B] u8, qsum [B] i32 (sum of the composite quals per read)
PyObject *py_encode_composite_2bit(PyObject *, PyObject *args) {
  PyObject *seqs, *quals;
  int edge;
  if (!PyArg_ParseTuple(args, "OOi", &seqs, &quals, &edge)) return nullptr;
  if (!PyList_Check(seqs) || !PyList_Check(quals)) {
    PyErr_SetString(PyExc_TypeError, "seqs/quals must be lists of bytes");
    return nullptr;
  }
  if (edge <= 0 || edge % 4 != 0) {
    PyErr_SetString(PyExc_ValueError, "edge must be positive multiple of 4");
    return nullptr;
  }
  Py_ssize_t B = PyList_GET_SIZE(seqs);
  if (PyList_GET_SIZE(quals) != B) {
    PyErr_SetString(PyExc_ValueError, "seqs/quals length mismatch");
    return nullptr;
  }
  const int W = 2 * edge, PB = edge / 2;
  std::vector<Span> sp(B), qp(B);
  for (Py_ssize_t i = 0; i < B; i++) {
    PyObject *s = PyList_GET_ITEM(seqs, i);
    PyObject *q = PyList_GET_ITEM(quals, i);
    if (!PyBytes_Check(s) || !PyBytes_Check(q)) {
      PyErr_SetString(PyExc_TypeError, "expected bytes elements");
      return nullptr;
    }
    sp[i] = {(const uint8_t *)PyBytes_AS_STRING(s), PyBytes_GET_SIZE(s)};
    qp[i] = {(const uint8_t *)PyBytes_AS_STRING(q), PyBytes_GET_SIZE(q)};
  }
  PyObject *packed_o = PyByteArray_FromStringAndSize(nullptr, B * PB);
  PyObject *qv_o = PyByteArray_FromStringAndSize(nullptr, (Py_ssize_t)B * W);
  PyObject *cl_o = PyByteArray_FromStringAndSize(nullptr, B * 4);
  PyObject *tl_o = PyByteArray_FromStringAndSize(nullptr, B * 4);
  PyObject *dr_o = PyByteArray_FromStringAndSize(nullptr, B);
  PyObject *qs_o = PyByteArray_FromStringAndSize(nullptr, B * 4);
  if (!packed_o || !qv_o || !cl_o || !tl_o || !dr_o || !qs_o) {
    Py_XDECREF(packed_o); Py_XDECREF(qv_o); Py_XDECREF(cl_o);
    Py_XDECREF(tl_o); Py_XDECREF(dr_o); Py_XDECREF(qs_o);
    return nullptr;
  }
  uint8_t *packed = (uint8_t *)PyByteArray_AS_STRING(packed_o);
  int8_t *qv = (int8_t *)PyByteArray_AS_STRING(qv_o);
  int32_t *cl = (int32_t *)PyByteArray_AS_STRING(cl_o);
  int32_t *tl = (int32_t *)PyByteArray_AS_STRING(tl_o);
  uint8_t *dr = (uint8_t *)PyByteArray_AS_STRING(dr_o);
  int32_t *qs = (int32_t *)PyByteArray_AS_STRING(qs_o);

  Py_BEGIN_ALLOW_THREADS
  int nt = nthreads_for(B);
  auto work = [&](Py_ssize_t lo, Py_ssize_t hi) {
    std::vector<uint8_t> codes(W);
    for (Py_ssize_t i = lo; i < hi; i++) {
      bool d = encode_one(sp[i], qp[i], edge, codes.data(), qv + i * W,
                          cl + i, tl + i);
      dr[i] = d ? 1 : 0;
      pack_2bit(codes.data(), W, packed + i * PB);
      int32_t sum = 0;
      const int8_t *row = qv + i * W;
      for (int k = 0; k < W; k++) sum += row[k];
      qs[i] = sum;
    }
  };
  if (nt <= 1) {
    work(0, B);
  } else {
    std::vector<std::thread> th;
    Py_ssize_t step = (B + nt - 1) / nt;
    for (int t = 0; t < nt; t++) {
      Py_ssize_t lo = t * step, hi = lo + step < B ? lo + step : B;
      if (lo < hi) th.emplace_back(work, lo, hi);
    }
    for (auto &t : th) t.join();
  }
  Py_END_ALLOW_THREADS

  PyObject *r = PyTuple_Pack(6, packed_o, qv_o, cl_o, tl_o, dr_o, qs_o);
  Py_DECREF(packed_o); Py_DECREF(qv_o); Py_DECREF(cl_o);
  Py_DECREF(tl_o); Py_DECREF(dr_o); Py_DECREF(qs_o);
  return r;
}

// encode_batch(seqs: list[bytes], L: int, pad: int) -> (codes, lens):
// codes [B, L] i8 (A0 C1 G2 T3 N4, pad byte elsewhere), lens [B] i32 —
// native dna.encode_batch for the full-length chimera-scan batches.
PyObject *py_encode_batch(PyObject *, PyObject *args) {
  PyObject *seqs;
  int L, pad;
  if (!PyArg_ParseTuple(args, "Oii", &seqs, &L, &pad)) return nullptr;
  if (!PyList_Check(seqs)) {
    PyErr_SetString(PyExc_TypeError, "seqs must be a list of bytes");
    return nullptr;
  }
  Py_ssize_t B = PyList_GET_SIZE(seqs);
  std::vector<Span> sp(B);
  for (Py_ssize_t i = 0; i < B; i++) {
    PyObject *s = PyList_GET_ITEM(seqs, i);
    if (!PyBytes_Check(s)) {
      PyErr_SetString(PyExc_TypeError, "expected bytes elements");
      return nullptr;
    }
    sp[i] = {(const uint8_t *)PyBytes_AS_STRING(s), PyBytes_GET_SIZE(s)};
  }
  PyObject *codes_o = PyByteArray_FromStringAndSize(nullptr, (Py_ssize_t)B * L);
  PyObject *lens_o = PyByteArray_FromStringAndSize(nullptr, B * 4);
  if (!codes_o || !lens_o) {
    Py_XDECREF(codes_o); Py_XDECREF(lens_o);
    return nullptr;
  }
  int8_t *codes = (int8_t *)PyByteArray_AS_STRING(codes_o);
  int32_t *lens = (int32_t *)PyByteArray_AS_STRING(lens_o);
  Py_BEGIN_ALLOW_THREADS
  int nt = nthreads_for(B);
  auto work = [&](Py_ssize_t lo, Py_ssize_t hi) {
    for (Py_ssize_t i = lo; i < hi; i++) {
      int n = (int)(sp[i].n < L ? sp[i].n : L);
      int8_t *row = codes + i * (Py_ssize_t)L;
      for (int k = 0; k < n; k++) {
        uint8_t c = ENC[sp[i].p[k]];
        row[k] = (int8_t)(c == 0xFF ? 4 : c);  // N_CODE = 4
      }
      memset(row + n, pad, L - n);
      lens[i] = n;
    }
  };
  if (nt <= 1) {
    work(0, B);
  } else {
    std::vector<std::thread> th;
    Py_ssize_t step = (B + nt - 1) / nt;
    for (int t = 0; t < nt; t++) {
      Py_ssize_t lo = t * step, hi = lo + step < B ? lo + step : B;
      if (lo < hi) th.emplace_back(work, lo, hi);
    }
    for (auto &t : th) t.join();
  }
  Py_END_ALLOW_THREADS
  PyObject *r = PyTuple_Pack(2, codes_o, lens_o);
  Py_DECREF(codes_o);
  Py_DECREF(lens_o);
  return r;
}

PyMethodDef methods[] = {
    {"encode_composite_2bit", py_encode_composite_2bit, METH_VARARGS,
     "fastq chunk -> (packed 2-bit composite, qv, comp_lens, true_lens, "
     "dirty, qsum) raw-bytes buffers"},
    {"encode_batch", py_encode_batch, METH_VARARGS,
     "list[bytes] -> ([B, L] int8 code matrix, lens int32) raw buffers"},
    {nullptr, nullptr, 0, nullptr}};

struct PyModuleDef moddef = {PyModuleDef_HEAD_INIT, "sicelore_hostenc",
                             "native host-side fastq encode kernels", -1,
                             methods};

}  // namespace

PyMODINIT_FUNC PyInit_sicelore_hostenc(void) {
  return PyModule_Create(&moddef);
}

// Native phrase / exact-match verification over the CSR postings.
//
// The keyword-find host path verifies for each scored hit whether the query
// tokens appear CONSECUTIVELY in the document (ematch detection + quoted
// phrases; parity intent: nidx_paragraph's exact-match detection and phrase
// queries, nidx_paragraph/src/lib.rs). In Python this is per-(hit, term)
// binary searches + position-set intersections and was the top host cost in
// the keyword-find profile — and it holds the GIL, throttling concurrent
// requests. This native batch verifier walks all hits of one segment in a
// single call with the GIL RELEASED.
//
// Inputs are the engine's own arrays (one segment):
//   doc_ids            int64[nd]   local doc ids to verify
//   term_docs          tuple of T  int32 arrays — each term's postings docs
//   term_lo            tuple of T  ints — each term's postings base offset
//   positions_offsets  int64[]     CSR offsets into positions (per posting)
//   positions          int32[]     token positions
// Returns: bytes[nd], 1 where all T terms appear at consecutive positions.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Buf {
    Py_buffer view{};
    bool ok = false;
    Buf(PyObject* obj, const char* what) {
        if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO) == 0) {
            ok = true;
        } else {
            PyErr_Format(PyExc_TypeError, "%s must support the buffer protocol", what);
        }
    }
    ~Buf() {
        if (ok) PyBuffer_Release(&view);
    }
    const void* data() const { return view.buf; }
    Py_ssize_t nbytes() const { return view.len; }
};

PyObject* phrase_match_batch(PyObject*, PyObject* args) {
    PyObject *doc_ids_obj, *term_docs_obj, *term_lo_obj, *poff_obj, *pos_obj;
    if (!PyArg_ParseTuple(args, "OOOOO", &doc_ids_obj, &term_docs_obj,
                          &term_lo_obj, &poff_obj, &pos_obj)) {
        return nullptr;
    }
    Buf doc_ids(doc_ids_obj, "doc_ids");
    Buf poff(poff_obj, "positions_offsets");
    Buf pos(pos_obj, "positions");
    if (!doc_ids.ok || !poff.ok || !pos.ok) return nullptr;
    if (doc_ids.view.itemsize != 8 || poff.view.itemsize != 8 ||
        pos.view.itemsize != 4) {
        PyErr_SetString(PyExc_ValueError,
                        "doc_ids/positions_offsets must be int64, positions int32");
        return nullptr;
    }

    if (!PySequence_Check(term_docs_obj) || !PySequence_Check(term_lo_obj)) {
        PyErr_SetString(PyExc_TypeError, "term_docs/term_lo must be sequences");
        return nullptr;
    }
    Py_ssize_t n_terms = PySequence_Size(term_docs_obj);
    if (n_terms != PySequence_Size(term_lo_obj) || n_terms <= 0) {
        PyErr_SetString(PyExc_ValueError, "term_docs/term_lo length mismatch or empty");
        return nullptr;
    }

    std::vector<Buf*> term_bufs;
    std::vector<int64_t> term_lo(n_terms);
    bool fail = false;
    for (Py_ssize_t t = 0; t < n_terms; ++t) {
        PyObject* td = PySequence_GetItem(term_docs_obj, t);
        PyObject* lo = PySequence_GetItem(term_lo_obj, t);
        if (td == nullptr || lo == nullptr) {
            Py_XDECREF(td);
            Py_XDECREF(lo);
            fail = true;
            break;
        }
        term_lo[size_t(t)] = PyLong_AsLongLong(lo);
        Py_DECREF(lo);
        Buf* b = new Buf(td, "term_docs[i]");
        Py_DECREF(td);  // buffer keeps its own reference to the exporter
        term_bufs.push_back(b);
        if (!b->ok || (PyErr_Occurred() != nullptr)) {
            fail = true;
            break;
        }
    }
    if (fail) {
        for (Buf* b : term_bufs) delete b;
        return nullptr;
    }

    const int64_t* ids = static_cast<const int64_t*>(doc_ids.data());
    Py_ssize_t nd = doc_ids.nbytes() / Py_ssize_t(sizeof(int64_t));
    const int64_t* offs = static_cast<const int64_t*>(poff.data());
    Py_ssize_t n_offs = poff.nbytes() / Py_ssize_t(sizeof(int64_t));
    const int32_t* positions = static_cast<const int32_t*>(pos.data());

    PyObject* out = PyBytes_FromStringAndSize(nullptr, nd);
    if (out == nullptr) {
        for (Buf* b : term_bufs) delete b;
        return nullptr;
    }
    char* result = PyBytes_AS_STRING(out);

    Py_BEGIN_ALLOW_THREADS;
    std::vector<int32_t> cur, nxt, merged;
    for (Py_ssize_t i = 0; i < nd; ++i) {
        const int32_t d = int32_t(ids[i]);
        bool match = true;
        cur.clear();
        for (Py_ssize_t t = 0; t < n_terms && match; ++t) {
            const int32_t* docs =
                static_cast<const int32_t*>(term_bufs[size_t(t)]->data());
            Py_ssize_t n_docs_t =
                term_bufs[size_t(t)]->nbytes() / Py_ssize_t(sizeof(int32_t));
            const int32_t* it = std::lower_bound(docs, docs + n_docs_t, d);
            if (it == docs + n_docs_t || *it != d) {
                match = false;
                break;
            }
            int64_t row = term_lo[size_t(t)] + (it - docs);
            if (row < 0 || row + 1 >= n_offs) {
                match = false;
                break;
            }
            int64_t plo = offs[row], phi = offs[row + 1];
            // inconsistent CSR inputs must not read outside the pool
            const int64_t n_pos = pos.nbytes() / int64_t(sizeof(int32_t));
            if (plo < 0 || phi < plo || phi > n_pos) {
                match = false;
                break;
            }
            if (t == 0) {
                cur.assign(positions + plo, positions + phi);
            } else {
                // intersect cur with (positions - t): both runs ascending
                nxt.clear();
                for (int64_t p = plo; p < phi; ++p) nxt.push_back(positions[p] - int32_t(t));
                merged.clear();
                std::set_intersection(cur.begin(), cur.end(), nxt.begin(),
                                      nxt.end(), std::back_inserter(merged));
                cur.swap(merged);
            }
            if (cur.empty()) match = false;
        }
        result[i] = match ? 1 : 0;
    }
    Py_END_ALLOW_THREADS;

    for (Buf* b : term_bufs) delete b;
    return out;
}

PyObject* phrase_scan(PyObject*, PyObject* args) {
    // Full phrase scan over ONE segment: walks the rarest term's postings
    // as the candidate driver and verifies consecutive positions inline —
    // the quoted-phrase MUST-mask build without materializing the
    // conjunction in Python (top-zipf bigrams at 1M docs paid ~270 ms in
    // intersect1d + per-candidate python round trips). Inputs as
    // phrase_match_batch minus doc_ids; returns bytes int32[] of matching
    // LOCAL doc ids (ascending).
    PyObject *term_docs_obj, *term_lo_obj, *poff_obj, *pos_obj;
    if (!PyArg_ParseTuple(args, "OOOO", &term_docs_obj, &term_lo_obj,
                          &poff_obj, &pos_obj)) {
        return nullptr;
    }
    Buf poff(poff_obj, "positions_offsets");
    Buf pos(pos_obj, "positions");
    if (!poff.ok || !pos.ok) return nullptr;
    if (poff.view.itemsize != 8 || pos.view.itemsize != 4) {
        PyErr_SetString(PyExc_ValueError,
                        "positions_offsets must be int64, positions int32");
        return nullptr;
    }
    if (!PySequence_Check(term_docs_obj) || !PySequence_Check(term_lo_obj)) {
        PyErr_SetString(PyExc_TypeError, "term_docs/term_lo must be sequences");
        return nullptr;
    }
    Py_ssize_t n_terms = PySequence_Size(term_docs_obj);
    if (n_terms != PySequence_Size(term_lo_obj) || n_terms <= 0) {
        PyErr_SetString(PyExc_ValueError, "term_docs/term_lo length mismatch or empty");
        return nullptr;
    }
    std::vector<Buf*> term_bufs;
    std::vector<int64_t> term_lo(n_terms);
    bool fail = false;
    for (Py_ssize_t t = 0; t < n_terms; ++t) {
        PyObject* td = PySequence_GetItem(term_docs_obj, t);
        PyObject* lo = PySequence_GetItem(term_lo_obj, t);
        if (td == nullptr || lo == nullptr) {
            Py_XDECREF(td);
            Py_XDECREF(lo);
            fail = true;
            break;
        }
        term_lo[size_t(t)] = PyLong_AsLongLong(lo);
        Py_DECREF(lo);
        Buf* b = new Buf(td, "term_docs[i]");
        Py_DECREF(td);
        term_bufs.push_back(b);
        if (!b->ok || (PyErr_Occurred() != nullptr)) {
            fail = true;
            break;
        }
    }
    if (fail) {
        for (Buf* b : term_bufs) delete b;
        return nullptr;
    }
    const int64_t* offs = static_cast<const int64_t*>(poff.data());
    Py_ssize_t n_offs = poff.nbytes() / Py_ssize_t(sizeof(int64_t));
    const int32_t* positions = static_cast<const int32_t*>(pos.data());
    const int64_t n_pos = pos.nbytes() / int64_t(sizeof(int32_t));

    std::vector<int32_t> out_ids;
    Py_BEGIN_ALLOW_THREADS;
    // driver = smallest postings list
    size_t drv = 0;
    for (size_t t = 1; t < size_t(n_terms); ++t) {
        if (term_bufs[t]->nbytes() < term_bufs[drv]->nbytes()) drv = t;
    }
    const int32_t* ddocs = static_cast<const int32_t*>(term_bufs[drv]->data());
    const Py_ssize_t nd = term_bufs[drv]->nbytes() / Py_ssize_t(sizeof(int32_t));
    std::vector<int32_t> cur, nxt, merged;
    std::vector<Py_ssize_t> hint(size_t(n_terms), 0);  // galloping cursors
    for (Py_ssize_t i = 0; i < nd; ++i) {
        const int32_t d = ddocs[i];
        bool match = true;
        cur.clear();
        for (Py_ssize_t t = 0; t < n_terms && match; ++t) {
            const int32_t* docs =
                static_cast<const int32_t*>(term_bufs[size_t(t)]->data());
            const Py_ssize_t n_docs_t =
                term_bufs[size_t(t)]->nbytes() / Py_ssize_t(sizeof(int32_t));
            // monotone candidates: advance each term's cursor by gallop
            Py_ssize_t lo = hint[size_t(t)], step = 1;
            while (lo + step < n_docs_t && docs[lo + step] < d) {
                lo += step;
                step <<= 1;
            }
            Py_ssize_t hi = std::min(lo + step, n_docs_t);
            const int32_t* it = std::lower_bound(docs + lo, docs + hi, d);
            hint[size_t(t)] = it - docs;
            if (it == docs + n_docs_t || *it != d) {
                match = false;
                break;
            }
            int64_t row = term_lo[size_t(t)] + (it - docs);
            if (row < 0 || row + 1 >= n_offs) {
                match = false;
                break;
            }
            int64_t plo = offs[row], phi = offs[row + 1];
            if (plo < 0 || phi < plo || phi > n_pos) {
                match = false;
                break;
            }
            if (t == 0) {
                cur.assign(positions + plo, positions + phi);
            } else {
                nxt.clear();
                for (int64_t p = plo; p < phi; ++p)
                    nxt.push_back(positions[p] - int32_t(t));
                merged.clear();
                std::set_intersection(cur.begin(), cur.end(), nxt.begin(),
                                      nxt.end(), std::back_inserter(merged));
                cur.swap(merged);
            }
            if (cur.empty()) match = false;
        }
        if (match) out_ids.push_back(d);
    }
    Py_END_ALLOW_THREADS;
    for (Buf* b : term_bufs) delete b;
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_ids.data()),
        Py_ssize_t(out_ids.size() * sizeof(int32_t)));
}

}  // namespace

extern "C" PyObject* phrase_match_batch_entry(PyObject* self, PyObject* args) {
    return phrase_match_batch(self, args);
}
extern "C" PyObject* phrase_scan_entry(PyObject* self, PyObject* args) {
    return phrase_scan(self, args);
}

// Native indexing hot path: tokenization + CSR postings building.
//
// The reference's segment builders are native (Rust: tantivy's tokenizer +
// inverted index writer, nidx_tantivy/src/lib.rs; nidx_vector's indexer).
// This CPython extension is the equivalent for the TPU build's text engine:
// given a batch of documents it produces the exact CSR arrays the
// device-side BM25 engine consumes (terms, postings offsets/docs/tfs,
// position lists, doc lengths) in one pass.
//
// Hot-loop design: tokens are never materialized as std::string during the
// scan — an open-addressing hash table (FNV-1a over the lowercased bytes)
// interns each distinct term once into a byte arena; postings append to
// per-term vectors addressed by term slot. Terms sort once at the end.
//
// Tokenizer semantics (must match nucliadb_tpu/index/text_engine/tokenizer.py):
//   - split on non-word characters; word characters are ASCII [A-Za-z0-9_]
//     and every byte >= 0x80 (UTF-8 sequences -> non-ASCII scripts intact),
//   - ASCII letters lowercased; non-ASCII bytes untouched,
//   - tokens longer than 40 bytes are dropped but still advance the position
//     counter, matching RemoveLongFilter(40).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

namespace {

constexpr size_t kMaxTokenLen = 40;

inline bool is_word_byte(unsigned char c) {
    return (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
           (c >= 'a' && c <= 'z') || c == '_' || c >= 0x80;
}

inline unsigned char lower_ascii(unsigned char c) {
    return (c >= 'A' && c <= 'Z') ? (unsigned char)(c - 'A' + 'a') : c;
}

struct Posting {
    std::vector<int32_t> docs;
    std::vector<uint16_t> tfs;
    std::vector<int64_t> pos_start;  // index into positions, per (doc) entry
    std::vector<int32_t> positions;  // per-term position pool
};

struct Interner {
    // open addressing, power-of-two capacity
    std::vector<int32_t> slots;      // term index + 1, 0 = empty
    std::vector<uint64_t> hashes;
    std::vector<uint32_t> term_off;  // into arena
    std::vector<uint32_t> term_len;
    std::string arena;
    size_t count = 0;

    Interner() : slots(1 << 12, 0), hashes(1 << 12, 0) {}

    static uint64_t fnv1a(const unsigned char* p, size_t n) {
        uint64_t h = 1469598103934665603ull;
        for (size_t i = 0; i < n; ++i) {
            h ^= lower_ascii(p[i]);
            h *= 1099511628211ull;
        }
        return h;
    }

    bool equals(int32_t idx, const unsigned char* p, size_t n) const {
        if (term_len[size_t(idx)] != n) return false;
        const char* t = arena.data() + term_off[size_t(idx)];
        for (size_t i = 0; i < n; ++i) {
            if ((unsigned char)t[i] != lower_ascii(p[i])) return false;
        }
        return true;
    }

    void grow() {
        size_t cap = slots.size() * 2;
        std::vector<int32_t> ns(cap, 0);
        std::vector<uint64_t> nh(cap, 0);
        for (size_t i = 0; i < slots.size(); ++i) {
            if (!slots[i]) continue;
            size_t j = size_t(hashes[i]) & (cap - 1);
            while (ns[j]) j = (j + 1) & (cap - 1);
            ns[j] = slots[i];
            nh[j] = hashes[i];
        }
        slots.swap(ns);
        hashes.swap(nh);
    }

    // returns term index; interns on first sight (lowercasing into arena)
    int32_t intern(const unsigned char* p, size_t n) {
        if (count * 2 >= slots.size()) grow();
        uint64_t h = fnv1a(p, n);
        size_t mask = slots.size() - 1;
        size_t j = size_t(h) & mask;
        while (slots[j]) {
            if (hashes[j] == h && equals(slots[j] - 1, p, n)) return slots[j] - 1;
            j = (j + 1) & mask;
        }
        int32_t idx = int32_t(count++);
        term_off.push_back(uint32_t(arena.size()));
        term_len.push_back(uint32_t(n));
        for (size_t i = 0; i < n; ++i) arena.push_back(char(lower_ascii(p[i])));
        slots[j] = idx + 1;
        hashes[j] = h;
        return idx;
    }
};

PyObject* bytes_from_vec(const void* data, size_t nbytes) {
    return PyBytes_FromStringAndSize(static_cast<const char*>(data), Py_ssize_t(nbytes));
}

// build_postings(docs: list[str|bytes])
//   -> (terms: list[str], offsets: bytes<int64>, docs: bytes<int32>,
//       tfs: bytes<uint16>, pos_offsets: bytes<int64>, positions: bytes<int32>,
//       dlen: bytes<int32>)
PyObject* build_postings(PyObject* self, PyObject* args) {
    PyObject* doc_list;
    if (!PyArg_ParseTuple(args, "O", &doc_list)) return nullptr;
    if (!PyList_Check(doc_list)) {
        PyErr_SetString(PyExc_TypeError, "expected a list of str/bytes");
        return nullptr;
    }
    Py_ssize_t n_docs = PyList_GET_SIZE(doc_list);

    Interner interner;
    std::vector<Posting> postings;
    std::vector<int32_t> dlen(size_t(n_docs), 0);

    for (Py_ssize_t d = 0; d < n_docs; ++d) {
        PyObject* item = PyList_GET_ITEM(doc_list, d);
        const char* data = nullptr;
        Py_ssize_t len = 0;
        if (PyUnicode_Check(item)) {
            data = PyUnicode_AsUTF8AndSize(item, &len);
            if (data == nullptr) return nullptr;
        } else if (PyBytes_Check(item)) {
            PyBytes_AsStringAndSize(item, const_cast<char**>(&data), &len);
        } else {
            PyErr_SetString(PyExc_TypeError, "documents must be str or bytes");
            return nullptr;
        }
        const unsigned char* u = (const unsigned char*)data;
        int32_t pos = 0;
        int32_t kept = 0;
        Py_ssize_t i = 0;
        while (i < len) {
            while (i < len && !is_word_byte(u[i])) i++;
            if (i >= len) break;
            Py_ssize_t start = i;
            while (i < len && is_word_byte(u[i])) i++;
            size_t tok_len = size_t(i - start);
            if (tok_len <= kMaxTokenLen) {
                int32_t t = interner.intern(u + start, tok_len);
                if (size_t(t) >= postings.size()) postings.emplace_back();
                Posting& p = postings[size_t(t)];
                if (!p.docs.empty() && p.docs.back() == int32_t(d)) {
                    if (p.tfs.back() < 65535) p.tfs.back()++;
                } else {
                    p.docs.push_back(int32_t(d));
                    p.tfs.push_back(1);
                    p.pos_start.push_back(int64_t(p.positions.size()));
                }
                p.positions.push_back(pos);
                kept++;
            }
            pos++;
        }
        dlen[size_t(d)] = kept;
    }

    // sort terms lexicographically (byte order == the python builder's)
    size_t n_terms = interner.count;
    std::vector<int32_t> order(n_terms);
    std::iota(order.begin(), order.end(), 0);
    const std::string& arena = interner.arena;
    std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
        const char* pa = arena.data() + interner.term_off[size_t(a)];
        const char* pb = arena.data() + interner.term_off[size_t(b)];
        size_t la = interner.term_len[size_t(a)], lb = interner.term_len[size_t(b)];
        int c = std::memcmp(pa, pb, std::min(la, lb));
        if (c) return c < 0;
        return la < lb;
    });

    std::vector<int64_t> offsets(n_terms + 1, 0);
    std::vector<int32_t> docs_flat;
    std::vector<uint16_t> tfs_flat;
    std::vector<int64_t> pos_offsets(1, 0);
    std::vector<int32_t> positions_flat;

    PyObject* terms = PyList_New(Py_ssize_t(n_terms));
    if (terms == nullptr) return nullptr;
    for (size_t ti = 0; ti < n_terms; ++ti) {
        int32_t t = order[ti];
        PyObject* s = PyUnicode_DecodeUTF8(
            arena.data() + interner.term_off[size_t(t)],
            Py_ssize_t(interner.term_len[size_t(t)]), "replace");
        PyList_SET_ITEM(terms, Py_ssize_t(ti), s);
        const Posting& p = postings[size_t(t)];
        for (size_t j = 0; j < p.docs.size(); ++j) {
            docs_flat.push_back(p.docs[j]);
            tfs_flat.push_back(p.tfs[j]);
            int64_t lo = p.pos_start[j];
            int64_t hi = (j + 1 < p.pos_start.size()) ? p.pos_start[j + 1]
                                                      : int64_t(p.positions.size());
            positions_flat.insert(
                positions_flat.end(), p.positions.begin() + lo, p.positions.begin() + hi);
            pos_offsets.push_back(int64_t(positions_flat.size()));
        }
        offsets[ti + 1] = int64_t(docs_flat.size());
    }

    return Py_BuildValue(
        "(NNNNNNN)",
        terms,
        bytes_from_vec(offsets.data(), offsets.size() * sizeof(int64_t)),
        bytes_from_vec(docs_flat.data(), docs_flat.size() * sizeof(int32_t)),
        bytes_from_vec(tfs_flat.data(), tfs_flat.size() * sizeof(uint16_t)),
        bytes_from_vec(pos_offsets.data(), pos_offsets.size() * sizeof(int64_t)),
        bytes_from_vec(positions_flat.data(), positions_flat.size() * sizeof(int32_t)),
        bytes_from_vec(dlen.data(), dlen.size() * sizeof(int32_t)));
}

// tokenize_with_positions(text: str) -> list[(token, pos)]
PyObject* tokenize_py(PyObject* self, PyObject* args) {
    const char* data;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "s#", &data, &len)) return nullptr;
    PyObject* out = PyList_New(0);
    if (out == nullptr) return nullptr;
    const unsigned char* u = (const unsigned char*)data;
    std::string tok;
    int32_t pos = 0;
    Py_ssize_t i = 0;
    while (i < len) {
        while (i < len && !is_word_byte(u[i])) i++;
        if (i >= len) break;
        Py_ssize_t start = i;
        while (i < len && is_word_byte(u[i])) i++;
        size_t tok_len = size_t(i - start);
        if (tok_len <= kMaxTokenLen) {
            tok.clear();
            for (size_t j = 0; j < tok_len; ++j) tok.push_back(char(lower_ascii(u[start + Py_ssize_t(j)])));
            PyObject* s = PyUnicode_DecodeUTF8(tok.data(), Py_ssize_t(tok.size()), "replace");
            PyObject* tup = Py_BuildValue("(Ni)", s, pos);
            if (tup == nullptr || PyList_Append(out, tup) < 0) {
                Py_XDECREF(tup);
                Py_DECREF(out);
                return nullptr;
            }
            Py_DECREF(tup);
        }
        pos++;
    }
    return out;
}

}  // namespace

extern "C" PyObject* hnsw_link_wave(PyObject*, PyObject*);  // hnsw_link.cpp
extern "C" PyObject* phrase_match_batch_entry(PyObject*, PyObject*);  // phrase.cpp
extern "C" PyObject* phrase_scan_entry(PyObject*, PyObject*);  // phrase.cpp
extern "C" PyObject* bm25_max_tfnorm_entry(PyObject*, PyObject*);  // bm25_wand.cpp
extern "C" PyObject* bm25_wand_search_entry(PyObject*, PyObject*);  // bm25_wand.cpp
extern "C" PyObject* bm25_wand_multi_entry(PyObject*, PyObject*);  // bm25_wand.cpp
extern "C" PyObject* bm25_match_multi_entry(PyObject*, PyObject*);  // bm25_wand.cpp
extern "C" PyObject* bm25_wand_req_multi_entry(PyObject*, PyObject*);  // bm25_wand.cpp
extern "C" PyObject* bm25_count_multi_entry(PyObject*, PyObject*);  // bm25_wand.cpp

namespace {

PyMethodDef methods[] = {
    {"build_postings", build_postings, METH_VARARGS,
     "Build CSR postings for a batch of documents."},
    {"tokenize_with_positions", tokenize_py, METH_VARARGS,
     "Tokenize a string into (token, ordinal) pairs."},
    {"hnsw_link_wave", hnsw_link_wave, METH_VARARGS,
     "Insert one wave of HNSW forward+reverse links (prune at Mmax)."},
    {"phrase_match_batch", phrase_match_batch_entry, METH_VARARGS,
     "Verify consecutive-phrase membership for a batch of docs (GIL-free)."},
    {"phrase_scan", phrase_scan_entry, METH_VARARGS,
     "Full phrase scan over one segment's CSR: matching local docs (GIL-free)."},
    {"bm25_max_tfnorm", bm25_max_tfnorm_entry, METH_VARARGS,
     "Per-term max BM25 tf-saturation (WAND upper bounds)."},
    {"bm25_wand_search", bm25_wand_search_entry, METH_VARARGS,
     "Single-core BM25+WAND top-k over CSR postings (GIL-free)."},
    {"bm25_wand_multi", bm25_wand_multi_entry, METH_VARARGS,
     "BM25+WAND top-k over per-(term,segment) cursors with mask (GIL-free)."},
    {"bm25_match_multi", bm25_match_multi_entry, METH_VARARGS,
     "Union match count/bitmap over per-(term,segment) cursors (GIL-free)."},
    {"bm25_wand_req_multi", bm25_wand_req_multi_entry, METH_VARARGS,
     "Required-count (AND) BM25+WAND top-k over cursors (GIL-free)."},
    {"bm25_count_multi", bm25_count_multi_entry, METH_VARARGS,
     "Per-doc matched-cursor count >= required bitmap/count (GIL-free)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "nucliadb_tpu_native",
    "Native indexing hot path (tokenizer + postings builder).", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_nucliadb_tpu_native(void) { return PyModule_Create(&module); }

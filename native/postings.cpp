// Native indexing hot path: tokenization + CSR postings building.
//
// The reference's segment builders are native (Rust: tantivy's tokenizer +
// inverted index writer, nidx_tantivy/src/lib.rs; nidx_vector's indexer).
// This CPython extension is the equivalent for the TPU build's text engine:
// given a batch of documents it produces the exact CSR arrays the
// device-side BM25 engine consumes (terms, postings offsets/docs/tfs,
// position lists, doc lengths) in one pass, ~20-40x faster than the Python
// dict-of-dicts builder.
//
// Tokenizer semantics (must match nucliadb_tpu/index/text_engine/tokenizer.py):
//   - split on non-word characters; word characters are ASCII [A-Za-z0-9_]
//     and every byte >= 0x80 (UTF-8 continuation/lead bytes -> non-ASCII
//     scripts stay intact),
//   - ASCII letters lowercased; non-ASCII bytes untouched,
//   - tokens longer than 40 bytes are dropped (but still advance the
//     position counter), matching RemoveLongFilter(40).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

constexpr size_t kMaxTokenLen = 40;

inline bool is_word_byte(unsigned char c) {
    return (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
           (c >= 'a' && c <= 'z') || c == '_' || c >= 0x80;
}

inline char lower_ascii(char c) {
    return (c >= 'A' && c <= 'Z') ? char(c - 'A' + 'a') : c;
}

struct Posting {
    std::vector<int32_t> docs;
    std::vector<uint16_t> tfs;
    std::vector<std::vector<int32_t>> positions;  // aligned with docs
};

// Tokenize one UTF-8 buffer, appending (token, ordinal) pairs via callback.
template <typename F>
void tokenize(const char* data, Py_ssize_t len, F&& emit) {
    int32_t pos = 0;
    Py_ssize_t i = 0;
    while (i < len) {
        while (i < len && !is_word_byte((unsigned char)data[i])) i++;
        if (i >= len) break;
        Py_ssize_t start = i;
        while (i < len && is_word_byte((unsigned char)data[i])) i++;
        size_t tok_len = size_t(i - start);
        if (tok_len <= kMaxTokenLen) {
            std::string tok(data + start, tok_len);
            for (auto& c : tok) c = lower_ascii(c);
            emit(std::move(tok), pos);
        }
        pos++;
    }
}

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

    std::map<std::string, Posting> index;  // ordered -> terms come out sorted
    std::vector<int32_t> dlen(size_t(n_docs), 0);

    for (Py_ssize_t d = 0; d < n_docs; ++d) {
        PyObject* item = PyList_GET_ITEM(doc_list, d);
        const char* data = nullptr;
        Py_ssize_t len = 0;
        PyObject* tmp = nullptr;
        if (PyUnicode_Check(item)) {
            data = PyUnicode_AsUTF8AndSize(item, &len);
            if (data == nullptr) return nullptr;
        } else if (PyBytes_Check(item)) {
            PyBytes_AsStringAndSize(item, const_cast<char**>(&data), &len);
        } else {
            PyErr_SetString(PyExc_TypeError, "documents must be str or bytes");
            return nullptr;
        }
        int32_t kept_tokens = 0;
        tokenize(data, len, [&](std::string&& tok, int32_t pos) {
            kept_tokens++;
            Posting& p = index[std::move(tok)];
            if (!p.docs.empty() && p.docs.back() == int32_t(d)) {
                if (p.tfs.back() < 65535) p.tfs.back()++;
                p.positions.back().push_back(pos);
            } else {
                p.docs.push_back(int32_t(d));
                p.tfs.push_back(1);
                p.positions.emplace_back(1, pos);
            }
        });
        dlen[size_t(d)] = kept_tokens;  // kept tokens only (python parity)
    }

    size_t n_terms = index.size();
    std::vector<int64_t> offsets(n_terms + 1, 0);
    std::vector<int32_t> docs_flat;
    std::vector<uint16_t> tfs_flat;
    std::vector<int64_t> pos_offsets(1, 0);
    std::vector<int32_t> positions_flat;

    PyObject* terms = PyList_New(Py_ssize_t(n_terms));
    if (terms == nullptr) return nullptr;
    size_t ti = 0;
    for (auto& kv : index) {
        PyObject* s = PyUnicode_DecodeUTF8(kv.first.data(), Py_ssize_t(kv.first.size()), "replace");
        PyList_SET_ITEM(terms, Py_ssize_t(ti), s);
        const Posting& p = kv.second;
        for (size_t j = 0; j < p.docs.size(); ++j) {
            docs_flat.push_back(p.docs[j]);
            tfs_flat.push_back(p.tfs[j]);
            positions_flat.insert(
                positions_flat.end(), p.positions[j].begin(), p.positions[j].end());
            pos_offsets.push_back(int64_t(positions_flat.size()));
        }
        offsets[ti + 1] = int64_t(docs_flat.size());
        ti++;
    }

    PyObject* result = Py_BuildValue(
        "(NNNNNNN)",
        terms,
        bytes_from_vec(offsets.data(), offsets.size() * sizeof(int64_t)),
        bytes_from_vec(docs_flat.data(), docs_flat.size() * sizeof(int32_t)),
        bytes_from_vec(tfs_flat.data(), tfs_flat.size() * sizeof(uint16_t)),
        bytes_from_vec(pos_offsets.data(), pos_offsets.size() * sizeof(int64_t)),
        bytes_from_vec(positions_flat.data(), positions_flat.size() * sizeof(int32_t)),
        bytes_from_vec(dlen.data(), dlen.size() * sizeof(int32_t)));
    return result;
}

// tokenize_with_positions(text: str) -> list[(token, pos)]
PyObject* tokenize_py(PyObject* self, PyObject* args) {
    const char* data;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "s#", &data, &len)) return nullptr;
    PyObject* out = PyList_New(0);
    if (out == nullptr) return nullptr;
    bool failed = false;
    tokenize(data, len, [&](std::string&& tok, int32_t pos) {
        if (failed) return;
        PyObject* s = PyUnicode_DecodeUTF8(tok.data(), Py_ssize_t(tok.size()), "replace");
        PyObject* tup = Py_BuildValue("(Ni)", s, pos);
        if (tup == nullptr || PyList_Append(out, tup) < 0) failed = true;
        Py_XDECREF(tup);
    });
    if (failed) {
        Py_DECREF(out);
        return nullptr;
    }
    return out;
}

PyMethodDef methods[] = {
    {"build_postings", build_postings, METH_VARARGS,
     "Build CSR postings for a batch of documents."},
    {"tokenize_with_positions", tokenize_py, METH_VARARGS,
     "Tokenize a string into (token, ordinal) pairs."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "nucliadb_tpu_native",
    "Native indexing hot path (tokenizer + postings builder).", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_nucliadb_tpu_native(void) { return PyModule_Create(&module); }

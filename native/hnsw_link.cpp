// HNSW wave linking: the host half of the batched graph builder.
//
// The device (ops/hnsw.py build_graph) scores one wave of inserts against
// the current graph with MXU matmuls and the keep-pruned heuristic; this
// function consumes the downloaded candidates and performs the sequential
// link insertion the reference does in Rust (nidx_vector/src/hnsw/build.rs
// bidirectional insert with prune at Mmax): forward edges for each wave
// node, then reverse edges replacing the weakest existing edge on overflow.
// The reverse-link dot products run over the float32 vector matrix.
//
// This was the indexing-side Python hot loop (~3.5 s per 20k rows); C++
// brings it to milliseconds.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BufGuard {
    Py_buffer view{};
    bool ok = false;
    ~BufGuard() {
        if (ok) PyBuffer_Release(&view);
    }
    bool get(PyObject* obj, int flags, const char* name, int ndim,
             Py_ssize_t itemsize) {
        if (PyObject_GetBuffer(obj, &view, flags | PyBUF_ND) != 0) return false;
        ok = true;
        if (view.ndim != ndim) {
            PyErr_Format(PyExc_ValueError, "%s: expected %d dims, got %d", name,
                         ndim, view.ndim);
            return false;
        }
        // wrong-width buffers (e.g. int64 adjacency) would be reinterpreted
        // and written out of bounds — reject instead of corrupting the heap
        if (view.itemsize != itemsize) {
            PyErr_Format(PyExc_ValueError, "%s: expected itemsize %zd, got %zd",
                         name, itemsize, view.itemsize);
            return false;
        }
        return true;
    }
};

inline float dot(const float* a, const float* b, Py_ssize_t d) {
    float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
    Py_ssize_t i = 0;
    for (; i + 4 <= d; i += 4) {
        acc0 += a[i] * b[i];
        acc1 += a[i + 1] * b[i + 1];
        acc2 += a[i + 2] * b[i + 2];
        acc3 += a[i + 3] * b[i + 3];
    }
    for (; i < d; i++) acc0 += a[i] * b[i];
    return acc0 + acc1 + acc2 + acc3;
}

}  // namespace

extern "C" PyObject* hnsw_link_wave(PyObject*, PyObject* args) {
    PyObject *adj_o, *count_o, *vec_o, *nodes_o, *cand_o, *kept_o;
    int m;
    if (!PyArg_ParseTuple(args, "OOOOOOi", &adj_o, &count_o, &vec_o, &nodes_o,
                          &cand_o, &kept_o, &m))
        return nullptr;

    BufGuard adj, count, vec, nodes, cand, kept;
    if (!adj.get(adj_o, PyBUF_WRITABLE | PyBUF_FORMAT, "adj", 2, 4)) return nullptr;
    if (!count.get(count_o, PyBUF_WRITABLE | PyBUF_FORMAT, "adj_count", 1, 4))
        return nullptr;
    if (!vec.get(vec_o, PyBUF_FORMAT, "vectors", 2, 4)) return nullptr;
    if (!nodes.get(nodes_o, PyBUF_FORMAT, "wave_nodes", 1, 4)) return nullptr;
    if (!cand.get(cand_o, PyBUF_FORMAT, "cand_ids", 2, 4)) return nullptr;
    if (!kept.get(kept_o, PyBUF_FORMAT, "kept", 2, 1)) return nullptr;

    const Py_ssize_t n = adj.view.shape[0];
    const Py_ssize_t m_max = adj.view.shape[1];
    const Py_ssize_t d = vec.view.shape[1];
    const Py_ssize_t w = nodes.view.shape[0];
    const Py_ssize_t ef = cand.view.shape[1];
    if (count.view.shape[0] != n || vec.view.shape[0] < n ||
        cand.view.shape[0] != w || kept.view.shape[0] != w ||
        kept.view.shape[1] != ef) {
        PyErr_SetString(PyExc_ValueError, "shape mismatch");
        return nullptr;
    }

    auto* adj_p = static_cast<int32_t*>(adj.view.buf);
    auto* count_p = static_cast<int32_t*>(count.view.buf);
    auto* vec_p = static_cast<const float*>(vec.view.buf);
    auto* nodes_p = static_cast<const int32_t*>(nodes.view.buf);
    auto* cand_p = static_cast<const int32_t*>(cand.view.buf);
    auto* kept_p = static_cast<const uint8_t*>(kept.view.buf);

    std::vector<int32_t> neigh;
    neigh.reserve(m);
    for (Py_ssize_t row = 0; row < w; row++) {
        const int32_t node = nodes_p[row];
        if (node < 0 || node >= n) continue;
        neigh.clear();
        for (Py_ssize_t j = 0; j < ef && (Py_ssize_t)neigh.size() < m; j++) {
            const int32_t t = cand_p[row * ef + j];
            if (kept_p[row * ef + j] && t >= 0 && t < n && t != node)
                neigh.push_back(t);
        }
        // forward: append into free slots
        int32_t c = count_p[node];
        for (int32_t t : neigh) {
            if (c >= m_max) break;
            adj_p[node * m_max + c++] = t;
        }
        count_p[node] = c;
        // reverse: append, or replace the weakest edge if stronger
        const float* node_vec = vec_p + (Py_ssize_t)node * d;
        for (int32_t t : neigh) {
            int32_t tc = count_p[t];
            if (tc < m_max) {
                adj_p[t * m_max + tc] = node;
                count_p[t] = tc + 1;
                continue;
            }
            const float* t_vec = vec_p + (Py_ssize_t)t * d;
            float weakest = 3.4e38f;
            Py_ssize_t weakest_i = 0;
            for (Py_ssize_t e = 0; e < m_max; e++) {
                const int32_t edge = adj_p[t * m_max + e];
                const float s =
                    edge >= 0 ? dot(vec_p + (Py_ssize_t)edge * d, t_vec, d) : -3.4e38f;
                if (s < weakest) {
                    weakest = s;
                    weakest_i = e;
                }
            }
            if (dot(node_vec, t_vec, d) > weakest)
                adj_p[t * m_max + weakest_i] = node;
        }
    }
    Py_RETURN_NONE;
}

// Single-core BM25 + WAND top-k scorer: the in-tree CPU baseline.
//
// The reference's text engine is tantivy (Rust), which this image cannot
// build — bench_suite's config 3 previously compared the TPU engine to a
// numpy strawman. This is the honest replacement: a real document-at-a-time
// WAND evaluator (Broder et al. 2003, the algorithm family tantivy/Lucene
// use for top-k union scoring) over the SAME CSR postings the native
// builder (postings.cpp) produces with the SAME tokenizer, scoring
// Lucene-compatible BM25 (k1=1.2, b=0.75 — engine.py:32-33). Single
// core, cache-friendly cursor layout, GIL released during evaluation.
//
// Entry points (buffer-protocol arrays, like the rest of this module):
//   bm25_max_tfnorm(offsets i64[nt+1], tfs u16[nnz], dl_norm f32[n_docs],
//                   docs i32[nnz], k1)
//       -> bytes f32[nt]: per-term max of (k1+1)*tf/(tf + k1*dl_norm[doc]),
//          the tf-saturation upper bound WAND prunes with (computed once
//          per index, like Lucene's per-term max impact).
//   bm25_wand_search(offsets i64[nt+1], docs i32[nnz], tfs u16[nnz],
//                    dl_norm f32[n_docs], maxtf f32[nt],
//                    qterms i64[q], qweights f32[q], k, k1)
//       -> (bytes f32[k] scores desc, bytes i64[k] doc ids, -1 padded).
//          qweights carry weight*idf so fuzzy-expansion downweighting and
//          the idf variant are the caller's policy, identical to the
//          engine's planner (engine.py _plan_slots).
//
// dl_norm[d] = 1 - b + b * doclen[d] / avgdl is precomputed by the caller:
// it folds three loads and two multiplies out of the inner loop.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <memory>
#include <vector>

namespace {

struct BufW {
    Py_buffer view{};
    bool ok = false;
    BufW(PyObject* obj, const char* what) {
        if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO) == 0) {
            ok = true;
        } else {
            PyErr_Format(PyExc_TypeError, "%s must support the buffer protocol",
                         what);
        }
    }
    ~BufW() {
        if (ok) PyBuffer_Release(&view);
    }
    const void* data() const { return view.buf; }
    Py_ssize_t nbytes() const { return view.len; }
};

constexpr int32_t kDocSentinel = std::numeric_limits<int32_t>::max();

struct Cursor {
    const int32_t* docs;
    const uint16_t* tfs;
    int64_t pos;
    int64_t end;
    int32_t doc;     // current doc id, kDocSentinel when exhausted
    float weight;    // weight * idf
    float ub;        // weight * idf * max_tfnorm (term's score ceiling)

    inline void advance_to(int32_t target) {
        // gallop + binary search: postings are doc-sorted
        int64_t lo = pos, step = 1;
        while (lo + step < end && docs[lo + step] < target) {
            lo += step;
            step <<= 1;
        }
        int64_t hi = std::min(lo + step, end);
        while (lo < hi) {
            int64_t mid = (lo + hi) >> 1;
            if (docs[mid] < target) lo = mid + 1; else hi = mid;
        }
        pos = lo;
        doc = pos < end ? docs[pos] : kDocSentinel;
    }
    inline void next() {
        ++pos;
        doc = pos < end ? docs[pos] : kDocSentinel;
    }
};

// fixed-size min-heap of (score, doc): root = weakest kept result
// kernel-parity ordering: jax.lax.top_k is stable, so on equal scores the
// LOWEST doc id wins. worse(a, b): a loses to b under that order.
inline bool worse(const std::pair<float, int64_t>& a,
                  const std::pair<float, int64_t>& b) {
    return a.first != b.first ? a.first < b.first : a.second > b.second;
}

struct TopK {
    std::vector<std::pair<float, int64_t>> h;  // heap front = current worst
    size_t k;
    explicit TopK(size_t k_) : k(k_) { h.reserve(k_); }
    static inline bool heap_cmp(const std::pair<float, int64_t>& a,
                                const std::pair<float, int64_t>& b) {
        return worse(b, a);  // max-heap on worseness → worst at front
    }
    inline float threshold() const {
        return h.size() == k ? h.front().first
                             : -std::numeric_limits<float>::infinity();
    }
    inline void push(float score, int64_t doc) {
        const std::pair<float, int64_t> e{score, doc};
        if (h.size() < k) {
            h.push_back(e);
            std::push_heap(h.begin(), h.end(), heap_cmp);
        } else if (worse(h.front(), e)) {
            std::pop_heap(h.begin(), h.end(), heap_cmp);
            h.back() = e;
            std::push_heap(h.begin(), h.end(), heap_cmp);
        }
    }
};

PyObject* bm25_max_tfnorm(PyObject*, PyObject* args) {
    PyObject *off_o, *tfs_o, *dl_o, *docs_o;
    double k1;
    if (!PyArg_ParseTuple(args, "OOOOd", &off_o, &tfs_o, &dl_o, &docs_o, &k1))
        return nullptr;
    BufW off(off_o, "offsets"), tfs(tfs_o, "tfs"), dl(dl_o, "dl_norm"),
        docs(docs_o, "docs");
    if (!off.ok || !tfs.ok || !dl.ok || !docs.ok) return nullptr;
    const auto* offsets = static_cast<const int64_t*>(off.data());
    const auto* tf = static_cast<const uint16_t*>(tfs.data());
    const auto* dln = static_cast<const float*>(dl.data());
    const auto* dc = static_cast<const int32_t*>(docs.data());
    const Py_ssize_t nt = off.nbytes() / Py_ssize_t(sizeof(int64_t)) - 1;
    std::vector<float> out(size_t(std::max<Py_ssize_t>(nt, 0)), 0.0f);
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t t = 0; t < nt; ++t) {
        float best = 0.0f;
        for (int64_t p = offsets[t]; p < offsets[t + 1]; ++p) {
            const float f = float(tf[p]);
            const float s = (float(k1) + 1.0f) * f / (f + float(k1) * dln[dc[p]]);
            if (s > best) best = s;
        }
        out[size_t(t)] = best;
    }
    Py_END_ALLOW_THREADS
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        Py_ssize_t(out.size() * sizeof(float)));
}

PyObject* bm25_wand_search(PyObject*, PyObject* args) {
    PyObject *off_o, *docs_o, *tfs_o, *dl_o, *max_o, *qt_o, *qw_o;
    Py_ssize_t k;
    double k1;
    if (!PyArg_ParseTuple(args, "OOOOOOOnd", &off_o, &docs_o, &tfs_o, &dl_o,
                          &max_o, &qt_o, &qw_o, &k, &k1))
        return nullptr;
    BufW off(off_o, "offsets"), docs(docs_o, "docs"), tfs(tfs_o, "tfs"),
        dl(dl_o, "dl_norm"), mx(max_o, "maxtf"), qt(qt_o, "qterms"),
        qw(qw_o, "qweights");
    if (!off.ok || !docs.ok || !tfs.ok || !dl.ok || !mx.ok || !qt.ok || !qw.ok)
        return nullptr;
    if (k <= 0) {
        PyErr_SetString(PyExc_ValueError, "k must be positive");
        return nullptr;
    }
    const auto* offsets = static_cast<const int64_t*>(off.data());
    const auto* dc = static_cast<const int32_t*>(docs.data());
    const auto* tf = static_cast<const uint16_t*>(tfs.data());
    const auto* dln = static_cast<const float*>(dl.data());
    const auto* maxtf = static_cast<const float*>(mx.data());
    const auto* qterms = static_cast<const int64_t*>(qt.data());
    const auto* qweights = static_cast<const float*>(qw.data());
    const Py_ssize_t nt = off.nbytes() / Py_ssize_t(sizeof(int64_t)) - 1;
    const Py_ssize_t nq = qt.nbytes() / Py_ssize_t(sizeof(int64_t));

    std::vector<float> out_s(size_t(k), 0.0f);
    std::vector<int64_t> out_i(size_t(k), -1);
    bool bad_term = false;
    Py_BEGIN_ALLOW_THREADS
    std::vector<Cursor> cur;
    cur.reserve(size_t(nq));
    for (Py_ssize_t i = 0; i < nq && !bad_term; ++i) {
        const int64_t t = qterms[i];
        if (t < 0 || t >= nt) { bad_term = true; break; }
        if (offsets[t] == offsets[t + 1]) continue;  // no postings
        Cursor c;
        c.docs = dc;
        c.tfs = tf;
        c.pos = offsets[t];
        c.end = offsets[t + 1];
        c.doc = dc[c.pos];
        c.weight = qweights[i];
        c.ub = qweights[i] * maxtf[t];
        cur.push_back(c);
    }
    if (!bad_term) {
        std::vector<Cursor*> order;
        order.reserve(cur.size());
        for (auto& c : cur) order.push_back(&c);
        TopK top{size_t(k)};
        const float kf = float(k1);
        while (!order.empty()) {
            // drop exhausted cursors, keep the rest sorted by current doc
            order.erase(std::remove_if(order.begin(), order.end(),
                                       [](Cursor* c) { return c->doc == kDocSentinel; }),
                        order.end());
            if (order.empty()) break;
            std::sort(order.begin(), order.end(),
                      [](Cursor* a, Cursor* b) { return a->doc < b->doc; });
            // pivot: first prefix whose summed ceilings can beat the heap
            const float theta = top.threshold();
            float acc = 0.0f;
            size_t pivot = order.size();
            for (size_t i = 0; i < order.size(); ++i) {
                acc += order[i]->ub;
                // >= not >: a doc scoring exactly theta can still enter on
                // the lower-doc-id tiebreak (kernel-stable-top_k parity)
                if (acc >= theta) { pivot = i; break; }
            }
            if (pivot == order.size()) break;  // nothing left can qualify
            const int32_t pdoc = order[pivot]->doc;
            if (order[0]->doc == pdoc) {
                // fully score the pivot document
                float score = 0.0f;
                const float d = dln[pdoc];
                for (auto* c : order) {
                    if (c->doc != pdoc) break;  // sorted: later docs are greater
                    const float f = float(c->tfs[c->pos]);
                    score += c->weight * (kf + 1.0f) * f / (f + kf * d);
                    c->next();
                }
                top.push(score, int64_t(pdoc));
            } else {
                // skip every cursor before the pivot up to the pivot doc
                for (size_t i = 0; i < pivot && order[i]->doc < pdoc; ++i)
                    order[i]->advance_to(pdoc);
            }
        }
        std::sort(top.h.begin(), top.h.end(),
                  [](const auto& a, const auto& b) {
                      return a.first != b.first ? a.first > b.first
                                                : a.second < b.second;
                  });
        for (size_t i = 0; i < top.h.size(); ++i) {
            out_s[i] = top.h[i].first;
            out_i[i] = top.h[i].second;
        }
    }
    Py_END_ALLOW_THREADS
    if (bad_term) {
        PyErr_SetString(PyExc_ValueError, "query term id out of range");
        return nullptr;
    }
    PyObject* scores = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_s.data()),
        Py_ssize_t(out_s.size() * sizeof(float)));
    PyObject* ids = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_i.data()),
        Py_ssize_t(out_i.size() * sizeof(int64_t)));
    if (!scores || !ids) {
        Py_XDECREF(scores);
        Py_XDECREF(ids);
        return nullptr;
    }
    PyObject* tup = PyTuple_Pack(2, scores, ids);
    Py_DECREF(scores);
    Py_DECREF(ids);
    return tup;
}

// ---------------------------------------------------------------------------
// Multi-cursor variants: the engine's host tier feeds one cursor per
// (query term x segment) straight from the per-segment memmapped CSR
// (builder.py postings_docs/postings_tfs) — no consolidated copy exists.
// Each cursor carries the segment's global doc offset; masks (deletions,
// filters, security) kill documents at full-scoring time, which preserves
// the WAND threshold invariant (skipping only removes candidates).
// ---------------------------------------------------------------------------

struct MCursor {
    const int32_t* docs;
    const uint16_t* tfs;  // null in match-only mode
    int64_t pos;
    int64_t end;
    int32_t off;     // segment's global doc offset
    int32_t doc;     // CURRENT GLOBAL doc id, kDocSentinel when exhausted
    float weight;
    float ub;

    inline void load() {
        doc = pos < end ? docs[pos] + off : kDocSentinel;
    }
    inline void advance_to(int32_t target_global) {
        const int32_t target = target_global - off;
        int64_t lo = pos, step = 1;
        while (lo + step < end && docs[lo + step] < target) {
            lo += step;
            step <<= 1;
        }
        int64_t hi = std::min(lo + step, end);
        while (lo < hi) {
            int64_t mid = (lo + hi) >> 1;
            if (docs[mid] < target) lo = mid + 1; else hi = mid;
        }
        pos = lo;
        load();
    }
    inline void next() {
        ++pos;
        load();
    }
};

// parse a list of contiguous buffers into (Buf holders, typed pointers)
bool collect_bufs(PyObject* list, const char* what,
                  std::vector<std::unique_ptr<BufW>>& hold,
                  std::vector<const void*>& ptrs,
                  std::vector<Py_ssize_t>& nbytes) {
    if (!PyList_Check(list) && !PyTuple_Check(list)) {
        PyErr_Format(PyExc_TypeError, "%s must be a list/tuple of buffers", what);
        return false;
    }
    PyObject* seq = PySequence_Fast(list, what);
    if (!seq) return false;
    const Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    for (Py_ssize_t i = 0; i < n; ++i) {
        auto b = std::make_unique<BufW>(PySequence_Fast_GET_ITEM(seq, i), what);
        if (!b->ok) {
            Py_DECREF(seq);
            return false;
        }
        ptrs.push_back(b->data());
        nbytes.push_back(b->nbytes());
        hold.push_back(std::move(b));
    }
    Py_DECREF(seq);
    return true;
}

PyObject* bm25_wand_multi(PyObject*, PyObject* args) {
    PyObject *docs_l, *tfs_l, *offs_o, *w_o, *mx_o, *dl_o, *mask_o;
    Py_ssize_t k;
    double k1;
    if (!PyArg_ParseTuple(args, "OOOOOOOnd", &docs_l, &tfs_l, &offs_o, &w_o,
                          &mx_o, &dl_o, &mask_o, &k, &k1))
        return nullptr;
    std::vector<std::unique_ptr<BufW>> hold;
    std::vector<const void*> dptr, tptr;
    std::vector<Py_ssize_t> dlen_b, tlen_b;
    if (!collect_bufs(docs_l, "doc_bufs", hold, dptr, dlen_b)) return nullptr;
    if (!collect_bufs(tfs_l, "tf_bufs", hold, tptr, tlen_b)) return nullptr;
    BufW offs(offs_o, "offs"), wv(w_o, "weights"), mx(mx_o, "maxtf"),
        dl(dl_o, "dl_norm");
    if (!offs.ok || !wv.ok || !mx.ok || !dl.ok) return nullptr;
    const bool has_mask = mask_o != Py_None;
    BufW mask(has_mask ? mask_o : dl_o, "mask");  // dl_o reused as dummy
    if (!mask.ok) return nullptr;
    const auto* offp = static_cast<const int64_t*>(offs.data());
    const auto* wp = static_cast<const float*>(wv.data());
    const auto* mxp = static_cast<const float*>(mx.data());
    const auto* dln = static_cast<const float*>(dl.data());
    const auto* mk = has_mask ? static_cast<const uint8_t*>(mask.data()) : nullptr;
    const size_t nc = dptr.size();
    if (tptr.size() != nc || size_t(offs.nbytes() / 8) != nc) {
        PyErr_SetString(PyExc_ValueError, "cursor array length mismatch");
        return nullptr;
    }
    if (k <= 0) {
        PyErr_SetString(PyExc_ValueError, "k must be positive");
        return nullptr;
    }
    std::vector<float> out_s(size_t(k), 0.0f);
    std::vector<int64_t> out_i(size_t(k), -1);
    Py_BEGIN_ALLOW_THREADS
    std::vector<MCursor> cur;
    cur.reserve(nc);
    for (size_t i = 0; i < nc; ++i) {
        const int64_t n_post = dlen_b[i] / Py_ssize_t(sizeof(int32_t));
        if (n_post == 0) continue;
        MCursor c;
        c.docs = static_cast<const int32_t*>(dptr[i]);
        c.tfs = static_cast<const uint16_t*>(tptr[i]);
        c.pos = 0;
        c.end = n_post;
        c.off = int32_t(offp[i]);
        c.weight = wp[i];
        c.ub = wp[i] * mxp[i];
        c.load();
        cur.push_back(c);
    }
    std::vector<MCursor*> order;
    order.reserve(cur.size());
    for (auto& c : cur) order.push_back(&c);
    TopK top{size_t(k)};
    const float kf = float(k1);
    while (!order.empty()) {
        order.erase(std::remove_if(order.begin(), order.end(),
                                   [](MCursor* c) { return c->doc == kDocSentinel; }),
                    order.end());
        if (order.empty()) break;
        std::sort(order.begin(), order.end(),
                  [](MCursor* a, MCursor* b) { return a->doc < b->doc; });
        const float theta = top.threshold();
        float acc = 0.0f;
        size_t pivot = order.size();
        for (size_t i = 0; i < order.size(); ++i) {
            acc += order[i]->ub;
            // >= for tie competition, as in bm25_wand_search above
            if (acc >= theta) { pivot = i; break; }
        }
        if (pivot == order.size()) break;
        const int32_t pdoc = order[pivot]->doc;
        if (order[0]->doc == pdoc) {
            if (mk != nullptr && !mk[pdoc]) {
                for (auto* c : order) {
                    if (c->doc != pdoc) break;
                    c->next();
                }
            } else {
                float score = 0.0f;
                const float d = dln[pdoc];
                for (auto* c : order) {
                    if (c->doc != pdoc) break;
                    const float f = float(c->tfs[c->pos]);
                    score += c->weight * (kf + 1.0f) * f / (f + kf * d);
                    c->next();
                }
                top.push(score, int64_t(pdoc));
            }
        } else {
            for (size_t i = 0; i < pivot && order[i]->doc < pdoc; ++i)
                order[i]->advance_to(pdoc);
        }
    }
    std::sort(top.h.begin(), top.h.end(),
              [](const auto& a, const auto& b) {
                  return a.first != b.first ? a.first > b.first
                                            : a.second < b.second;
              });
    for (size_t i = 0; i < top.h.size(); ++i) {
        out_s[i] = top.h[i].first;
        out_i[i] = top.h[i].second;
    }
    Py_END_ALLOW_THREADS
    PyObject* scores = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_s.data()),
        Py_ssize_t(out_s.size() * sizeof(float)));
    PyObject* ids = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_i.data()),
        Py_ssize_t(out_i.size() * sizeof(int64_t)));
    if (!scores || !ids) {
        Py_XDECREF(scores);
        Py_XDECREF(ids);
        return nullptr;
    }
    PyObject* tup = PyTuple_Pack(2, scores, ids);
    Py_DECREF(scores);
    Py_DECREF(ids);
    return tup;
}

PyObject* bm25_wand_req_multi(PyObject*, PyObject* args) {
    // Required-count (AND-semantics) document-at-a-time evaluator: a doc
    // qualifies when at least ``required`` cursors land on it (the device
    // kernel's `counts >= required` gate, engine.py _bm25_groups_core);
    // its score is the full BM25 sum over ALL cursors at the doc, and its
    // matched-cursor count rides along (the kernel's top_counts). Pivoting
    // extends WAND: the pivot is the first sorted-cursor prefix satisfying
    // BOTH the count requirement (prefix size >= required) and the score
    // ceiling (sum of upper bounds >= heap threshold) — any doc below the
    // pivot doc fails one of the two, by pivot minimality.
    PyObject *docs_l, *tfs_l, *offs_o, *w_o, *mx_o, *dl_o, *mask_o;
    Py_ssize_t k, required;
    double k1;
    if (!PyArg_ParseTuple(args, "OOOOOOOndn", &docs_l, &tfs_l, &offs_o, &w_o,
                          &mx_o, &dl_o, &mask_o, &k, &k1, &required))
        return nullptr;
    std::vector<std::unique_ptr<BufW>> hold;
    std::vector<const void*> dptr, tptr;
    std::vector<Py_ssize_t> dlen_b, tlen_b;
    if (!collect_bufs(docs_l, "doc_bufs", hold, dptr, dlen_b)) return nullptr;
    if (!collect_bufs(tfs_l, "tf_bufs", hold, tptr, tlen_b)) return nullptr;
    BufW offs(offs_o, "offs"), wv(w_o, "weights"), mx(mx_o, "maxtf"),
        dl(dl_o, "dl_norm");
    if (!offs.ok || !wv.ok || !mx.ok || !dl.ok) return nullptr;
    const bool has_mask = mask_o != Py_None;
    BufW mask(has_mask ? mask_o : dl_o, "mask");
    if (!mask.ok) return nullptr;
    const auto* offp = static_cast<const int64_t*>(offs.data());
    const auto* wp = static_cast<const float*>(wv.data());
    const auto* mxp = static_cast<const float*>(mx.data());
    const auto* dln = static_cast<const float*>(dl.data());
    const auto* mk = has_mask ? static_cast<const uint8_t*>(mask.data()) : nullptr;
    const size_t nc = dptr.size();
    if (tptr.size() != nc || size_t(offs.nbytes() / 8) != nc) {
        PyErr_SetString(PyExc_ValueError, "cursor array length mismatch");
        return nullptr;
    }
    if (k <= 0 || required < 1) {
        PyErr_SetString(PyExc_ValueError, "k and required must be positive");
        return nullptr;
    }
    std::vector<float> out_s(size_t(k), 0.0f);
    std::vector<int64_t> out_i(size_t(k), -1);
    std::vector<int32_t> out_c(size_t(k), -1);
    Py_BEGIN_ALLOW_THREADS
    int64_t total_post = 0;
    for (const Py_ssize_t nb : dlen_b) total_post += nb / Py_ssize_t(sizeof(int32_t));
    if (total_post <= 1024) {
        // Accumulation fast path: WAND's per-round cursor sort only pays
        // off when pruning can actually skip documents. A fuzzy-expanded
        // query over a tiny corpus (many cursors, tiny posting lists,
        // flat scores, nearly every doc matching) spends more sorting
        // cursors per round than scoring everything — measured 545 µs/query
        // at 50 cursors x 200 docs vs ~6 µs here. The threshold is tight
        // (1024 postings): at ~2.3k postings over a 100k corpus the
        // idf-diverse scores let WAND prune to 32 µs while accumulation
        // pays P log P ≈ 112 µs. Gather every (doc, contrib) pair, sort
        // once, aggregate runs, same TopK comparator — identical results
        // up to float summation order.
        struct Entry { int32_t doc; int32_t cur; float contrib; };
        std::vector<Entry> entries;
        entries.reserve(size_t(total_post));
        const float kf0 = float(k1);
        for (size_t i = 0; i < nc; ++i) {
            const int64_t n_post = dlen_b[i] / Py_ssize_t(sizeof(int32_t));
            const auto* docs = static_cast<const int32_t*>(dptr[i]);
            const auto* tfs = static_cast<const uint16_t*>(tptr[i]);
            const int32_t off = int32_t(offp[i]);
            const float w = wp[i];
            for (int64_t p = 0; p < n_post; ++p) {
                const int32_t d = docs[p] + off;
                const float f = float(tfs[p]);
                entries.push_back({d, int32_t(i),
                                   w * (kf0 + 1.0f) * f / (f + kf0 * dln[d])});
            }
        }
        std::sort(entries.begin(), entries.end(),
                  [](const Entry& a, const Entry& b) {
                      return a.doc != b.doc ? a.doc < b.doc : a.cur < b.cur;
                  });
        TopK top{size_t(k)};
        std::vector<std::pair<int64_t, int32_t>> counted;
        size_t i = 0;
        while (i < entries.size()) {
            const int32_t d = entries[i].doc;
            float score = 0.0f;
            int32_t count = 0;
            while (i < entries.size() && entries[i].doc == d) {
                score += entries[i].contrib;
                ++count;
                ++i;
            }
            if (count >= int32_t(required) && (mk == nullptr || mk[d])) {
                const float theta_now = top.threshold();
                top.push(score, int64_t(d));
                if (score >= theta_now) counted.emplace_back(int64_t(d), count);
            }
        }
        std::sort(top.h.begin(), top.h.end(),
                  [](const auto& a, const auto& b) {
                      return a.first != b.first ? a.first > b.first
                                                : a.second < b.second;
                  });
        std::sort(counted.begin(), counted.end());
        for (size_t j = 0; j < top.h.size(); ++j) {
            out_s[j] = top.h[j].first;
            out_i[j] = top.h[j].second;
            auto it = std::lower_bound(
                counted.begin(), counted.end(),
                std::make_pair(top.h[j].second, int32_t(0)));
            if (it != counted.end() && it->first == top.h[j].second)
                out_c[j] = it->second;
        }
    } else {
    std::vector<MCursor> cur;
    cur.reserve(nc);
    for (size_t i = 0; i < nc; ++i) {
        const int64_t n_post = dlen_b[i] / Py_ssize_t(sizeof(int32_t));
        if (n_post == 0) continue;
        MCursor c;
        c.docs = static_cast<const int32_t*>(dptr[i]);
        c.tfs = static_cast<const uint16_t*>(tptr[i]);
        c.pos = 0;
        c.end = n_post;
        c.off = int32_t(offp[i]);
        c.weight = wp[i];
        c.ub = wp[i] * mxp[i];
        c.load();
        cur.push_back(c);
    }
    std::vector<MCursor*> order;
    order.reserve(cur.size());
    for (auto& c : cur) order.push_back(&c);
    // (score, doc) heap as in the OR path; counts resolved at output time
    // from a doc->count side map filled when the doc is fully scored
    TopK top{size_t(k)};
    std::vector<std::pair<int64_t, int32_t>> counted;  // (doc, count) log
    const float kf = float(k1);
    const auto by_doc = [](MCursor* a, MCursor* b) { return a->doc < b->doc; };
    // `order` stays SORTED BY CURRENT DOC across rounds: each round only
    // the advanced prefix [0, moved) changes, so the repair is
    // sort(prefix) + inplace_merge — O(j log j + C) instead of the
    // O(C log C) full re-sort per round, which dominated conjunctions
    // over many fuzzy-variant cursors (theta stays -inf when matches are
    // rarer than k, so every union doc used to pay the full sort).
    // Exhausted cursors carry kDocSentinel = INT32_MAX and sink to the
    // tail naturally; they are trimmed, which preserves sortedness.
    std::sort(order.begin(), order.end(), by_doc);
    while (order.size() >= size_t(required)) {
        while (!order.empty() && order.back()->doc == kDocSentinel)
            order.pop_back();
        if (order.size() < size_t(required)) break;
        const float theta = top.threshold();
        float acc = 0.0f;
        size_t pivot = order.size();
        for (size_t i = 0; i < order.size(); ++i) {
            acc += order[i]->ub;
            if (i + 1 >= size_t(required) && acc >= theta) { pivot = i; break; }
        }
        if (pivot == order.size()) break;
        const int32_t pdoc = order[pivot]->doc;
        size_t moved = 0;
        if (order[0]->doc == pdoc) {
            // the cursors at pdoc are exactly the order[] prefix
            int32_t count = 0;
            for (auto* c : order) {
                if (c->doc != pdoc) break;
                ++count;
            }
            if (count >= int32_t(required) && (mk == nullptr || mk[pdoc])) {
                float score = 0.0f;
                const float d = dln[pdoc];
                for (auto* c : order) {
                    if (c->doc != pdoc) break;
                    const float f = float(c->tfs[c->pos]);
                    score += c->weight * (kf + 1.0f) * f / (f + kf * d);
                    c->next();
                    ++moved;
                }
                const float theta_now = top.threshold();
                top.push(score, int64_t(pdoc));
                // only log docs that could be in the final top-k
                if (score >= theta_now) {
                    counted.emplace_back(int64_t(pdoc), count);
                }
            } else {
                for (auto* c : order) {
                    if (c->doc != pdoc) break;
                    c->next();
                    ++moved;
                }
            }
        } else {
            for (size_t i = 0; i < pivot && order[i]->doc < pdoc; ++i) {
                order[i]->advance_to(pdoc);
                ++moved;
            }
        }
        if (moved) {
            std::sort(order.begin(), order.begin() + long(moved), by_doc);
            std::inplace_merge(order.begin(), order.begin() + long(moved),
                               order.end(), by_doc);
        }
    }
    std::sort(top.h.begin(), top.h.end(),
              [](const auto& a, const auto& b) {
                  return a.first != b.first ? a.first > b.first
                                            : a.second < b.second;
              });
    std::sort(counted.begin(), counted.end());
    for (size_t i = 0; i < top.h.size(); ++i) {
        out_s[i] = top.h[i].first;
        out_i[i] = top.h[i].second;
        auto it = std::lower_bound(
            counted.begin(), counted.end(),
            std::make_pair(top.h[i].second, int32_t(0)));
        if (it != counted.end() && it->first == top.h[i].second)
            out_c[i] = it->second;
    }
    }
    Py_END_ALLOW_THREADS
    PyObject* scores = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_s.data()),
        Py_ssize_t(out_s.size() * sizeof(float)));
    PyObject* ids = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_i.data()),
        Py_ssize_t(out_i.size() * sizeof(int64_t)));
    PyObject* cnts = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_c.data()),
        Py_ssize_t(out_c.size() * sizeof(int32_t)));
    if (!scores || !ids || !cnts) {
        Py_XDECREF(scores);
        Py_XDECREF(ids);
        Py_XDECREF(cnts);
        return nullptr;
    }
    PyObject* tup = PyTuple_Pack(3, scores, ids, cnts);
    Py_DECREF(scores);
    Py_DECREF(ids);
    Py_DECREF(cnts);
    return tup;
}

PyObject* bm25_count_multi(PyObject*, PyObject* args) {
    // per-doc matched-cursor counts thresholded at ``required`` ∩ mask:
    // the corpus-wide matched set an AND query reports (kernel parity:
    // engine.py `matched = (counts >= required) & mask`). want_bitmap=0
    // returns just the count of qualifying docs.
    PyObject *docs_l, *offs_o, *mask_o;
    Py_ssize_t n_docs, required;
    int want_bitmap;
    if (!PyArg_ParseTuple(args, "OOOnnp", &docs_l, &offs_o, &mask_o, &n_docs,
                          &required, &want_bitmap))
        return nullptr;
    std::vector<std::unique_ptr<BufW>> hold;
    std::vector<const void*> dptr;
    std::vector<Py_ssize_t> dlen_b;
    if (!collect_bufs(docs_l, "doc_bufs", hold, dptr, dlen_b)) return nullptr;
    BufW offs(offs_o, "offs");
    if (!offs.ok) return nullptr;
    const bool has_mask = mask_o != Py_None;
    BufW mask(has_mask ? mask_o : offs_o, "mask");
    if (!mask.ok) return nullptr;
    const auto* offp = static_cast<const int64_t*>(offs.data());
    const auto* mk = has_mask ? static_cast<const uint8_t*>(mask.data()) : nullptr;
    if (required < 1) {
        PyErr_SetString(PyExc_ValueError, "required must be positive");
        return nullptr;
    }
    std::vector<uint16_t> counts(size_t(std::max<Py_ssize_t>(n_docs, 0)), 0);
    std::vector<uint8_t> bitmap;
    int64_t total = 0;
    Py_BEGIN_ALLOW_THREADS
    for (size_t i = 0; i < dptr.size(); ++i) {
        const auto* docs = static_cast<const int32_t*>(dptr[i]);
        const int64_t n_post = dlen_b[i] / Py_ssize_t(sizeof(int32_t));
        const int32_t off = int32_t(offp[i]);
        for (int64_t p = 0; p < n_post; ++p) {
            const int64_t d = int64_t(docs[p]) + off;
            if (d >= 0 && d < n_docs && counts[size_t(d)] < 65535)
                ++counts[size_t(d)];
        }
    }
    if (want_bitmap) {
        bitmap.resize(size_t(std::max<Py_ssize_t>(n_docs, 0)), 0);
        for (Py_ssize_t d = 0; d < n_docs; ++d) {
            bitmap[size_t(d)] =
                counts[size_t(d)] >= required && (mk == nullptr || mk[d]);
        }
    } else {
        for (Py_ssize_t d = 0; d < n_docs; ++d) {
            total += counts[size_t(d)] >= required && (mk == nullptr || mk[d]);
        }
    }
    Py_END_ALLOW_THREADS
    if (want_bitmap) {
        return PyBytes_FromStringAndSize(
            reinterpret_cast<const char*>(bitmap.data()), n_docs);
    }
    return PyLong_FromLongLong(total);
}

PyObject* bm25_match_multi(PyObject*, PyObject* args) {
    // union of the cursors' doc sets ∩ mask: the corpus-wide matched set an
    // OR query reports (kernel parity: engine.py `matched = score>0 & mask`)
    PyObject *docs_l, *offs_o, *mask_o;
    Py_ssize_t n_docs;
    int want_bitmap;
    if (!PyArg_ParseTuple(args, "OOOnp", &docs_l, &offs_o, &mask_o, &n_docs,
                          &want_bitmap))
        return nullptr;
    std::vector<std::unique_ptr<BufW>> hold;
    std::vector<const void*> dptr;
    std::vector<Py_ssize_t> dlen_b;
    if (!collect_bufs(docs_l, "doc_bufs", hold, dptr, dlen_b)) return nullptr;
    BufW offs(offs_o, "offs");
    if (!offs.ok) return nullptr;
    const bool has_mask = mask_o != Py_None;
    BufW mask(has_mask ? mask_o : offs_o, "mask");
    if (!mask.ok) return nullptr;
    const auto* offp = static_cast<const int64_t*>(offs.data());
    const auto* mk = has_mask ? static_cast<const uint8_t*>(mask.data()) : nullptr;
    int64_t total_post = 0;
    for (const Py_ssize_t nb : dlen_b) total_post += nb / Py_ssize_t(sizeof(int32_t));
    if (!want_bitmap && total_post * 96 < int64_t(n_docs)) {
        // sparse count: sort-unique the visited ids — for RARE terms the
        // P log P sort beats even touching an n_docs bitmap. Measured
        // crossover on this host ~n_docs/96 (at 1M docs / 30k postings the
        // bitmap path is 2.5x faster; the sort wins below ~10k postings).
        int64_t count = 0;
        Py_BEGIN_ALLOW_THREADS
        std::vector<int32_t> ids;
        ids.reserve(size_t(total_post));
        for (size_t i = 0; i < dptr.size(); ++i) {
            const auto* docs = static_cast<const int32_t*>(dptr[i]);
            const int64_t n_post = dlen_b[i] / Py_ssize_t(sizeof(int32_t));
            const int32_t off = int32_t(offp[i]);
            for (int64_t p = 0; p < n_post; ++p) {
                const int64_t d = int64_t(docs[p]) + off;
                if (d >= 0 && d < n_docs) ids.push_back(int32_t(d));
            }
        }
        std::sort(ids.begin(), ids.end());
        ids.erase(std::unique(ids.begin(), ids.end()), ids.end());
        if (mk != nullptr) {
            for (const int32_t d : ids) count += mk[d];
        } else {
            count = int64_t(ids.size());
        }
        Py_END_ALLOW_THREADS
        return PyLong_FromLongLong(count);
    }
    std::vector<uint8_t> bitmap(size_t(std::max<Py_ssize_t>(n_docs, 0)), 0);
    int64_t count = 0;
    Py_BEGIN_ALLOW_THREADS
    if (!want_bitmap) {
        // count-only: fuse masked counting into the traversal — P random
        // touches + one memset, never a full-corpus second pass
        for (size_t i = 0; i < dptr.size(); ++i) {
            const auto* docs = static_cast<const int32_t*>(dptr[i]);
            const int64_t n_post = dlen_b[i] / Py_ssize_t(sizeof(int32_t));
            const int32_t off = int32_t(offp[i]);
            for (int64_t p = 0; p < n_post; ++p) {
                const int64_t d = int64_t(docs[p]) + off;
                if (d >= 0 && d < n_docs && !bitmap[size_t(d)]) {
                    bitmap[size_t(d)] = 1;
                    count += mk != nullptr ? int64_t(mk[d]) : 1;
                }
            }
        }
    } else {
        for (size_t i = 0; i < dptr.size(); ++i) {
            const auto* docs = static_cast<const int32_t*>(dptr[i]);
            const int64_t n_post = dlen_b[i] / Py_ssize_t(sizeof(int32_t));
            const int32_t off = int32_t(offp[i]);
            for (int64_t p = 0; p < n_post; ++p) {
                const int64_t d = int64_t(docs[p]) + off;
                if (d >= 0 && d < n_docs) bitmap[size_t(d)] = 1;
            }
        }
        if (mk != nullptr) {
            for (Py_ssize_t d = 0; d < n_docs; ++d) bitmap[size_t(d)] &= mk[d];
        }
    }
    Py_END_ALLOW_THREADS
    if (want_bitmap) {
        return PyBytes_FromStringAndSize(
            reinterpret_cast<const char*>(bitmap.data()), n_docs);
    }
    return PyLong_FromLongLong(count);
}

}  // namespace

extern "C" PyObject* bm25_max_tfnorm_entry(PyObject* self, PyObject* args) {
    return bm25_max_tfnorm(self, args);
}
extern "C" PyObject* bm25_wand_search_entry(PyObject* self, PyObject* args) {
    return bm25_wand_search(self, args);
}
extern "C" PyObject* bm25_wand_multi_entry(PyObject* self, PyObject* args) {
    return bm25_wand_multi(self, args);
}
extern "C" PyObject* bm25_match_multi_entry(PyObject* self, PyObject* args) {
    return bm25_match_multi(self, args);
}
extern "C" PyObject* bm25_wand_req_multi_entry(PyObject* self, PyObject* args) {
    return bm25_wand_req_multi(self, args);
}
extern "C" PyObject* bm25_count_multi_entry(PyObject* self, PyObject* args) {
    return bm25_count_multi(self, args);
}

// Native host-side graph preprocessing kernels.
//
// The TPU compute path is JAX/XLA/Pallas; everything that happens BEFORE a
// graph reaches the device — CSR building, ELL packing (ops/ell.py),
// fixed-k neighbor sampling (utils/graph_utils.py RandomNeighborSampler),
// community ordering for partitioning (parallel/partition.py) — is host
// work. The numpy implementations are vectorized but still pay O(E log E)
// argsorts and allocate large temporaries; these C++ kernels are O(E)
// counting sorts and tight loops, OpenMP-parallel where order doesn't
// matter, and are loaded through ctypes (tf_geometric_tpu/native/__init__.py)
// with transparent numpy fallback.
//
// All functions use the C ABI. Index convention matches the Python side:
// int32 node/edge ids (sentinel = num_rows / num_edges for padding),
// int64 sizes and row pointers.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Stable counting sort of edges by row. order[i] = index into the original
// arrays of the i-th edge in row-sorted order. O(E + num_rows).
void tfg_sort_by_row(const int32_t* rows, int64_t num_edges, int32_t num_rows,
                     int64_t* order) {
    std::vector<int64_t> starts((size_t)num_rows + 2, 0);
    for (int64_t e = 0; e < num_edges; ++e) {
        int32_t r = rows[e];
        if (r < 0 || r > num_rows) r = num_rows;  // clamp strays to sentinel
        starts[(size_t)r + 1]++;
    }
    for (size_t i = 1; i < starts.size(); ++i) starts[i] += starts[i - 1];
    for (int64_t e = 0; e < num_edges; ++e) {
        int32_t r = rows[e];
        if (r < 0 || r > num_rows) r = num_rows;
        order[starts[(size_t)r]++] = e;
    }
}

// CSR row pointers from (unsorted) rows. row_ptr has num_rows+1 entries.
void tfg_build_row_ptr(const int32_t* rows, int64_t num_edges,
                       int32_t num_rows, int64_t* row_ptr) {
    std::memset(row_ptr, 0, sizeof(int64_t) * ((size_t)num_rows + 1));
    for (int64_t e = 0; e < num_edges; ++e) {
        int32_t r = rows[e];
        if (r >= 0 && r < num_rows) row_ptr[r + 1]++;
    }
    for (int32_t i = 0; i < num_rows; ++i) row_ptr[i + 1] += row_ptr[i];
}

// ELL packing from row-sorted edges (ops/ell.py build_ell_arrays semantics):
// first K edges of each row into slots (pad: col 0 / val 0 / eid sentinel),
// overflow appended to the tail in input order. Returns the tail length.
int64_t tfg_ell_pack(const int32_t* r_sorted, const int32_t* c_sorted,
                     const float* v_sorted, const int32_t* e_sorted,
                     int64_t num_edges, int32_t num_rows, int32_t K,
                     int32_t eid_sentinel,
                     int32_t* slots_col, float* slots_val, int32_t* slot_eid,
                     int32_t* tail_r, int32_t* tail_c, float* tail_v,
                     int32_t* tail_e) {
    const int64_t n_slots = (int64_t)num_rows * K;
    std::memset(slots_col, 0, sizeof(int32_t) * n_slots);
    std::memset(slots_val, 0, sizeof(float) * n_slots);
    for (int64_t i = 0; i < n_slots; ++i) slot_eid[i] = eid_sentinel;

    int64_t tail_len = 0;
    int64_t e = 0;
    while (e < num_edges) {
        const int32_t r = r_sorted[e];
        if (r < 0 || r >= num_rows) { ++e; continue; }  // padded edges drop
        int64_t run_end = e;
        while (run_end < num_edges && r_sorted[run_end] == r) ++run_end;
        const int64_t in_ell = std::min<int64_t>(K, run_end - e);
        int64_t base = (int64_t)r * K;
        for (int64_t j = 0; j < in_ell; ++j) {
            slots_col[base + j] = c_sorted[e + j];
            slots_val[base + j] = v_sorted[e + j];
            slot_eid[base + j] = e_sorted[e + j];
        }
        for (int64_t j = e + K; j < run_end; ++j) {
            tail_r[tail_len] = r;
            tail_c[tail_len] = c_sorted[j];
            tail_v[tail_len] = v_sorted[j];
            tail_e[tail_len] = e_sorted[j];
            ++tail_len;
        }
        e = run_end;
    }
    return tail_len;
}

// Fused counting-sort + ELL pack straight from unsorted COO — avoids
// materializing the four row-sorted temporaries the two-step path needs.
int64_t tfg_ell_pack_coo(const int32_t* rows, const int32_t* cols,
                         const float* vals, const int32_t* eids,
                         int64_t num_edges, int32_t num_rows, int32_t K,
                         int32_t eid_sentinel,
                         int32_t* slots_col, float* slots_val,
                         int32_t* slot_eid,
                         int32_t* tail_r, int32_t* tail_c, float* tail_v,
                         int32_t* tail_e) {
    const int64_t n_slots = (int64_t)num_rows * K;
    std::memset(slots_col, 0, sizeof(int32_t) * n_slots);
    std::memset(slots_val, 0, sizeof(float) * n_slots);
    for (int64_t i = 0; i < n_slots; ++i) slot_eid[i] = eid_sentinel;

    // counting pass: per-row degree (out-of-range edges dropped)
    std::vector<int64_t> ptr((size_t)num_rows + 1, 0);
    for (int64_t e = 0; e < num_edges; ++e) {
        const int32_t r = rows[e];
        if (r >= 0 && r < num_rows) ptr[(size_t)r + 1]++;
    }
    // tail starts: overflow beyond K per row, laid out row-contiguously
    std::vector<int64_t> tail_ptr((size_t)num_rows, 0);
    int64_t tail_len = 0;
    for (int32_t r = 0; r < num_rows; ++r) {
        tail_ptr[r] = tail_len;
        const int64_t deg = ptr[(size_t)r + 1];
        if (deg > K) tail_len += deg - K;
    }
    // placement pass (stable: input order within each row)
    std::vector<int64_t> fill((size_t)num_rows, 0);
    for (int64_t e = 0; e < num_edges; ++e) {
        const int32_t r = rows[e];
        if (r < 0 || r >= num_rows) continue;
        const int64_t pos = fill[r]++;
        if (pos < K) {
            const int64_t base = (int64_t)r * K + pos;
            slots_col[base] = cols[e];
            slots_val[base] = vals[e];
            slot_eid[base] = eids[e];
        } else {
            const int64_t t = tail_ptr[r] + (pos - K);
            tail_r[t] = r;
            tail_c[t] = cols[e];
            tail_v[t] = vals[e];
            tail_e[t] = eids[e];
        }
    }
    return tail_len;
}

// splitmix64: deterministic per-(seed, source, slot) stream — results do not
// depend on the thread schedule.
static inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ULL;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
    return x ^ (x >> 31);
}

// Fixed-k with-replacement neighbor draw per source (RandomNeighborSampler
// padding=True semantics): isolated sources self-pad with weight 0.
void tfg_sample_fixed_k(const int64_t* row_ptr, const int32_t* col,
                        const float* weight, const int64_t* sources,
                        int64_t num_sources, int32_t k, uint64_t seed,
                        int32_t* out_col, float* out_w) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t s = 0; s < num_sources; ++s) {
        const int64_t src = sources[s];
        const int64_t start = row_ptr[src];
        const int64_t deg = row_ptr[src + 1] - start;
        int32_t* oc = out_col + s * k;
        float* ow = out_w + s * k;
        if (deg == 0) {
            for (int32_t j = 0; j < k; ++j) { oc[j] = (int32_t)src; ow[j] = 0.f; }
            continue;
        }
        uint64_t state = seed ^ (0x632BE59BD9B4E019ULL * (uint64_t)(src + 1));
        for (int32_t j = 0; j < k; ++j) {
            state = splitmix64(state);
            const int64_t pick = (int64_t)(state % (uint64_t)deg);
            oc[j] = col[start + pick];
            ow[j] = weight[start + pick];
        }
    }
}

// One label-propagation sweep (synchronous majority vote over in-neighbors,
// smallest-label tie-break). Returns the number of label changes.
// scratch must hold >= max_degree int64 entries per thread; we size it
// internally instead for simplicity.
int64_t tfg_lpa_sweep(const int64_t* row_ptr, const int32_t* col,
                      int32_t num_nodes, const int64_t* labels,
                      int64_t* new_labels) {
    int64_t changes = 0;
#ifdef _OPENMP
#pragma omp parallel reduction(+ : changes)
#endif
    {
        std::vector<int64_t> buf;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 1024)
#endif
        for (int32_t n = 0; n < num_nodes; ++n) {
            const int64_t start = row_ptr[n], end = row_ptr[n + 1];
            if (end == start) { new_labels[n] = labels[n]; continue; }
            buf.clear();
            buf.reserve(end - start);
            for (int64_t e = start; e < end; ++e) buf.push_back(labels[col[e]]);
            std::sort(buf.begin(), buf.end());
            int64_t best = buf[0], best_count = 1, cur = buf[0], cur_count = 1;
            for (size_t i = 1; i < buf.size(); ++i) {
                if (buf[i] == cur) ++cur_count;
                else { cur = buf[i]; cur_count = 1; }
                if (cur_count > best_count) { best = cur; best_count = cur_count; }
            }
            new_labels[n] = best;
            if (best != labels[n]) ++changes;
        }
    }
    return changes;
}

// Capacity-constrained partition refinement (parallel/partition.py
// partition_order steps 3-4): gain-ordered greedy moves of nodes to the
// part holding most of their neighbors, with bounded slack, then an
// exactness repair draining overfull parts into underfull ones. Graph is
// symmetric CSR (each endpoint sees the other). Mutates `part` in place and
// returns the total number of moves. On exit fill(part) == caps exactly.
int64_t tfg_partition_refine(const int64_t* row_ptr, const int32_t* col,
                             int32_t num_nodes, int32_t num_parts,
                             const int64_t* caps, int32_t slack,
                             int32_t num_iters, int32_t* part) {
    const int32_t P = num_parts;
    std::vector<int64_t> fill((size_t)P, 0);
    for (int32_t n = 0; n < num_nodes; ++n) fill[part[n]]++;
    std::vector<int32_t> best((size_t)num_nodes);
    std::vector<int64_t> gain((size_t)num_nodes);
    std::vector<int64_t> movers;
    int64_t total_moves = 0;

    for (int32_t it = 0; it < num_iters; ++it) {
        // pass 1 (parallel): best target + gain from the current snapshot
#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            std::vector<int64_t> cnt((size_t)P);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 2048)
#endif
            for (int32_t n = 0; n < num_nodes; ++n) {
                std::fill(cnt.begin(), cnt.end(), 0);
                for (int64_t e = row_ptr[n]; e < row_ptr[n + 1]; ++e)
                    cnt[part[col[e]]]++;
                int32_t b = 0;
                for (int32_t p = 1; p < P; ++p)
                    if (cnt[p] > cnt[b]) b = p;
                best[n] = b;
                gain[n] = cnt[b] - cnt[part[n]];
            }
        }
        movers.clear();
        for (int32_t n = 0; n < num_nodes; ++n)
            if (best[n] != part[n] && gain[n] > 0) movers.push_back(n);
        if (movers.empty()) break;
        std::sort(movers.begin(), movers.end(),
                  [&](int64_t a, int64_t b) {
                      if (gain[a] != gain[b]) return gain[a] > gain[b];
                      return a < b;
                  });
        int64_t moved = 0;
        for (int64_t n : movers) {
            const int32_t b = best[n];
            if (fill[b] < caps[b] + slack) {
                fill[part[n]]--;
                fill[b]++;
                part[n] = (int32_t)b;
                ++moved;
            }
        }
        total_moves += moved;
        if (moved == 0) break;
    }

    // exactness repair: drain overfull parts, evicting the members that
    // lose the least locality, into the best still-underfull part
    std::vector<int64_t> cnt((size_t)P);
    for (int32_t p = 0; p < P; ++p) {
        int64_t excess = fill[p] - caps[p];
        if (excess <= 0) continue;
        std::vector<std::pair<int64_t, int32_t>> scored;  // (-score, node)
        for (int32_t n = 0; n < num_nodes; ++n) {
            if (part[n] != p) continue;
            std::fill(cnt.begin(), cnt.end(), 0);
            for (int64_t e = row_ptr[n]; e < row_ptr[n + 1]; ++e)
                cnt[part[col[e]]]++;
            int32_t t = -1;
            for (int32_t q = 0; q < P; ++q)
                if (fill[q] < caps[q] && (t < 0 || cnt[q] > cnt[t])) t = q;
            if (t < 0) break;
            scored.emplace_back(-(cnt[t] - cnt[p]), n);
        }
        std::sort(scored.begin(), scored.end());
        for (auto& sn : scored) {
            if (excess == 0) break;
            const int32_t n = sn.second;
            std::fill(cnt.begin(), cnt.end(), 0);
            for (int64_t e = row_ptr[n]; e < row_ptr[n + 1]; ++e)
                cnt[part[col[e]]]++;
            int32_t t = -1;
            for (int32_t q = 0; q < P; ++q)
                if (fill[q] < caps[q] && (t < 0 || cnt[q] > cnt[t])) t = q;
            if (t < 0) break;
            fill[p]--;
            fill[t]++;
            part[n] = t;
            --excess;
            ++total_moves;
        }
    }
    return total_moves;
}

}  // extern "C"

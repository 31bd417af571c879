// mbots_host — native host-side data plane for madrona_bots_tpu.
//
// The reference's host layer (src/entry/mgr.cpp) owns the executor and the
// export path: per-tick device sorts put observation rows in species-major
// order and SimBridge publishes per-world row offsets (sim.cpp:985-999,
// 1148-1149). In the TPU rebuild the device side is shape-static (no sorts),
// and the species-major "exported tensor" view is produced on the host.
// This library implements that export path natively:
//
//   - mbots_compaction: counting-sort permutation by (species, world, slot)
//     over the padded [W, A] alive/species arrays (O(N), no comparison sort)
//   - mbots_gather_*: permute padded rows into compacted export buffers
//   - mbots_scatter_*: inverse (staged action/memory writes back to padding)
//   - mbots_world_offsets: per-world agent offsets/counts (the SimBridge
//     readback, mgr.cpp:57-62, computed host-side in O(N))
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: native/build.sh -> libmbots_host.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Compute the species-major permutation.
//   alive:   [W*A] int8 (0/1), species: [W*A] int32 (1..num_species)
//   perm_out:[W*A] int32 — first `return`ed entries are flat indices of alive
//            agents ordered by (species asc, world asc, slot asc)
//   species_starts_out: [num_species+1] int32 — row offsets per species
// Returns the number of alive agents (rows in the export).
int32_t mbots_compaction(const int8_t* alive, const int32_t* species,
                         int32_t num_worlds, int32_t max_agents,
                         int32_t num_species, int32_t* perm_out,
                         int32_t* species_starts_out) {
    const int64_t n = (int64_t)num_worlds * max_agents;
    // counting pass
    std::vector<int32_t> counts(num_species + 1, 0);
    for (int64_t i = 0; i < n; ++i) {
        if (alive[i]) counts[species[i]]++;  // species is 1-based
    }
    int32_t total = 0;
    species_starts_out[0] = 0;
    for (int32_t s = 1; s <= num_species; ++s) {
        total += counts[s];
        species_starts_out[s] = species_starts_out[s - 1] + counts[s];
    }
    // placement pass (flat order is already (world, slot) ascending, so the
    // counting sort is stable in exactly the order the spec requires)
    std::vector<int32_t> cursor(num_species + 1);
    for (int32_t s = 0; s <= num_species; ++s) cursor[s] = species_starts_out[s > 0 ? s - 1 : 0];
    for (int32_t s = 1; s <= num_species; ++s) cursor[s] = species_starts_out[s - 1];
    for (int64_t i = 0; i < n; ++i) {
        if (alive[i]) perm_out[cursor[species[i]]++] = (int32_t)i;
    }
    return total;
}

// Per-world offsets/counts over a world-major enumeration of alive agents
// (SimBridge::agentWorldOffsets / agentWorldCounts, sim.hpp:74-78).
void mbots_world_offsets(const int8_t* alive, int32_t num_worlds,
                         int32_t max_agents, int32_t* offsets_out,
                         int32_t* counts_out) {
    int32_t running = 0;
    for (int32_t w = 0; w < num_worlds; ++w) {
        offsets_out[w] = running;
        int32_t c = 0;
        const int8_t* row = alive + (int64_t)w * max_agents;
        for (int32_t a = 0; a < max_agents; ++a) c += row[a] ? 1 : 0;
        counts_out[w] = c;
        running += c;
    }
}

// Gather padded rows into export order: out[r, :] = src[perm[r], :].
#define DEFINE_GATHER(name, T)                                              \
    void name(const T* src, const int32_t* perm, int32_t n_rows,            \
              int32_t row_elems, T* out) {                                  \
        for (int32_t r = 0; r < n_rows; ++r) {                              \
            std::memcpy(out + (int64_t)r * row_elems,                       \
                        src + (int64_t)perm[r] * row_elems,                 \
                        sizeof(T) * row_elems);                             \
        }                                                                   \
    }

DEFINE_GATHER(mbots_gather_f32, float)
DEFINE_GATHER(mbots_gather_i32, int32_t)
DEFINE_GATHER(mbots_gather_u8, uint8_t)

// Scatter export-order rows back into the padded layout:
// dst[perm[r], :] = src[r, :]  (the action/memory write-back).
#define DEFINE_SCATTER(name, T)                                             \
    void name(const T* src, const int32_t* perm, int32_t n_rows,            \
              int32_t row_elems, T* dst) {                                  \
        for (int32_t r = 0; r < n_rows; ++r) {                              \
            std::memcpy(dst + (int64_t)perm[r] * row_elems,                 \
                        src + (int64_t)r * row_elems,                       \
                        sizeof(T) * row_elems);                             \
        }                                                                   \
    }

DEFINE_SCATTER(mbots_scatter_f32, float)
DEFINE_SCATTER(mbots_scatter_i32, int32_t)

// Inverse permutation: inv[perm[r]] = r (sensor_index_tensor support).
void mbots_inverse_perm(const int32_t* perm, int32_t n_rows, int32_t n_total,
                        int32_t* inv_out) {
    for (int32_t i = 0; i < n_total; ++i) inv_out[i] = -1;
    for (int32_t r = 0; r < n_rows; ++r) inv_out[perm[r]] = r;
}

}  // extern "C"

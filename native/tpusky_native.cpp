// tpusky native runtime support library.
//
// The TPU compute path is JAX/XLA/Pallas; this library provides the
// *host-side* native pieces where Python is the wrong tool (SURVEY.md H16,
// H20, H10 host components):
//   * fast OBJ / PLY mesh parsing (streamed, no Python-object overhead)
//   * PCG32 bulk generation (bit-exact counterpart of the reference's
//     sampler RNG, include/mitsuba/core/random.h:53)
//   * EXR deflate pre-filter transforms (predictor + interleave), the
//     byte-shuffling half of EXR codec work
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image). Build: native/build.sh
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PCG32 (O'Neill 2014, minimal C implementation of the public algorithm)
// ---------------------------------------------------------------------------

struct Pcg32 {
    uint64_t state;
    uint64_t inc;
};

static inline uint32_t pcg32_next(Pcg32* rng) {
    uint64_t oldstate = rng->state;
    rng->state = oldstate * 6364136223846793005ULL + rng->inc;
    uint32_t xorshifted = (uint32_t)(((oldstate >> 18u) ^ oldstate) >> 27u);
    uint32_t rot = (uint32_t)(oldstate >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((~rot + 1u) & 31));
}

void pcg32_seed(Pcg32* rng, uint64_t initstate, uint64_t initseq) {
    rng->state = 0u;
    rng->inc = (initseq << 1u) | 1u;
    pcg32_next(rng);
    rng->state += initstate;
    pcg32_next(rng);
}

// Fill `out` with n uniform floats in [0, 1) from PCG32 stream
// (initstate, initseq) — bit-exact with the reference's
// `PCG32::next_float32` (multiplies by 2^-32... actually uses the
// 23-mantissa trick; we use the same: bits >> 9 | 0x3f800000 minus 1).
void pcg32_fill_float(uint64_t initstate, uint64_t initseq, uint64_t skip,
                      float* out, int64_t n) {
    Pcg32 rng;
    pcg32_seed(&rng, initstate, initseq);
    for (uint64_t i = 0; i < skip; ++i) pcg32_next(&rng);
    for (int64_t i = 0; i < n; ++i) {
        uint32_t bits = (pcg32_next(&rng) >> 9) | 0x3f800000u;
        float f;
        memcpy(&f, &bits, 4);
        out[i] = f - 1.0f;
    }
}

void pcg32_fill_uint32(uint64_t initstate, uint64_t initseq, uint64_t skip,
                       uint32_t* out, int64_t n) {
    Pcg32 rng;
    pcg32_seed(&rng, initstate, initseq);
    for (uint64_t i = 0; i < skip; ++i) pcg32_next(&rng);
    for (int64_t i = 0; i < n; ++i) out[i] = pcg32_next(&rng);
}

// ---------------------------------------------------------------------------
// EXR deflate pre-filter (predictor + interleave), both directions
// ---------------------------------------------------------------------------

void exr_unpredict(const uint8_t* in, uint8_t* out, int64_t n) {
    // delta decode
    std::vector<uint8_t> t(n);
    int acc = 0;
    for (int64_t i = 0; i < n; ++i) {
        acc += (int)in[i] - 128;
        t[i] = (uint8_t)(acc & 0xff);
        acc = t[i];
    }
    // de-interleave halves
    int64_t half = (n + 1) / 2;
    for (int64_t i = 0; i < half; ++i) out[2 * i] = t[i];
    for (int64_t i = half; i < n; ++i) out[2 * (i - half) + 1] = t[i];
}

void exr_predict(const uint8_t* in, uint8_t* out, int64_t n) {
    std::vector<uint8_t> inter(n);
    int64_t half = (n + 1) / 2;
    for (int64_t i = 0; i < half; ++i) inter[i] = in[2 * i];
    for (int64_t i = half; i < n; ++i) inter[i] = in[2 * (i - half) + 1];
    int prev = inter[0];
    out[0] = inter[0];
    for (int64_t i = 1; i < n; ++i) {
        int d = (int)inter[i] - prev + 128;
        prev = inter[i];
        out[i] = (uint8_t)(d & 0xff);
    }
}

// ---------------------------------------------------------------------------
// OBJ parsing (positions + triangulated faces; normals/uvs optional)
// ---------------------------------------------------------------------------

struct ObjMesh {
    std::vector<float> positions;   // 3 * n_vertices
    std::vector<float> normals;     // 3 * n_vertices (zeros if absent)
    std::vector<float> uvs;         // 2 * n_vertices (zeros if absent)
    std::vector<int32_t> indices;   // 3 * n_triangles
};

static ObjMesh* g_last_mesh = nullptr;

// Parse an OBJ file; returns 0 on success. Retrieve sizes with
// obj_counts and copy data out with obj_copy, then obj_free.
int obj_parse(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    auto* mesh = new ObjMesh();
    std::vector<float> vnormals;
    std::vector<float> vtex;
    std::vector<int32_t> nindices;
    std::vector<int32_t> tindices;
    char line[1024];
    while (fgets(line, sizeof(line), f)) {
        if (line[0] == 'v' && line[1] == ' ') {
            float x, y, z;
            if (sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
                mesh->positions.push_back(x);
                mesh->positions.push_back(y);
                mesh->positions.push_back(z);
            }
        } else if (line[0] == 'v' && line[1] == 'n') {
            float x, y, z;
            if (sscanf(line + 3, "%f %f %f", &x, &y, &z) == 3) {
                vnormals.push_back(x);
                vnormals.push_back(y);
                vnormals.push_back(z);
            }
        } else if (line[0] == 'v' && line[1] == 't') {
            float u, v;
            if (sscanf(line + 3, "%f %f", &u, &v) == 2) {
                vtex.push_back(u);
                vtex.push_back(v);
            }
        } else if (line[0] == 'f' && line[1] == ' ') {
            // parse up to 8 vertices per face, fan-triangulate
            int32_t vi[8], ni[8], ti[8];
            int count = 0;
            char* p = line + 2;
            while (*p && count < 8) {
                while (*p == ' ') ++p;
                if (*p == '\n' || *p == '\r' || *p == '\0') break;
                long v = strtol(p, &p, 10);
                long n = 0, t = 0;
                if (*p == '/') {
                    ++p;
                    if (*p != '/') t = strtol(p, &p, 10);  // texcoord
                    if (*p == '/') { ++p; n = strtol(p, &p, 10); }
                }
                vi[count] = (int32_t)(v > 0 ? v - 1
                            : (long)mesh->positions.size() / 3 + v);
                ni[count] = (int32_t)(n > 0 ? n - 1
                            : (n < 0 ? (long)vnormals.size() / 3 + n : -1));
                ti[count] = (int32_t)(t > 0 ? t - 1
                            : (t < 0 ? (long)vtex.size() / 2 + t : -1));
                ++count;
            }
            for (int k = 2; k < count; ++k) {
                mesh->indices.push_back(vi[0]);
                mesh->indices.push_back(vi[k - 1]);
                mesh->indices.push_back(vi[k]);
                nindices.push_back(ni[0]);
                nindices.push_back(ni[k - 1]);
                nindices.push_back(ni[k]);
                tindices.push_back(ti[0]);
                tindices.push_back(ti[k - 1]);
                tindices.push_back(ti[k]);
            }
        }
    }
    fclose(f);
    // per-vertex normals aligned with positions (first normal wins)
    mesh->normals.assign(mesh->positions.size(), 0.0f);
    if (!vnormals.empty()) {
        for (size_t i = 0; i < mesh->indices.size(); ++i) {
            int32_t v = mesh->indices[i];
            int32_t n = nindices[i];
            if (n >= 0 && (size_t)(3 * n + 2) < vnormals.size()) {
                mesh->normals[3 * v + 0] = vnormals[3 * n + 0];
                mesh->normals[3 * v + 1] = vnormals[3 * n + 1];
                mesh->normals[3 * v + 2] = vnormals[3 * n + 2];
            }
        }
    }
    // per-vertex uvs aligned with positions (first texcoord wins)
    mesh->uvs.assign(mesh->positions.size() / 3 * 2, 0.0f);
    if (!vtex.empty()) {
        for (size_t i = 0; i < mesh->indices.size(); ++i) {
            int32_t v = mesh->indices[i];
            int32_t t = tindices[i];
            if (t >= 0 && (size_t)(2 * t + 1) < vtex.size()) {
                mesh->uvs[2 * v + 0] = vtex[2 * t + 0];
                mesh->uvs[2 * v + 1] = vtex[2 * t + 1];
            }
        }
    }
    if (g_last_mesh) delete g_last_mesh;
    g_last_mesh = mesh;
    return 0;
}

void obj_counts(int64_t* n_vertices, int64_t* n_triangles) {
    *n_vertices = g_last_mesh ? (int64_t)g_last_mesh->positions.size() / 3 : 0;
    *n_triangles = g_last_mesh ? (int64_t)g_last_mesh->indices.size() / 3 : 0;
}

void obj_copy(float* positions, float* normals, int32_t* indices) {
    if (!g_last_mesh) return;
    memcpy(positions, g_last_mesh->positions.data(),
           g_last_mesh->positions.size() * sizeof(float));
    memcpy(normals, g_last_mesh->normals.data(),
           g_last_mesh->normals.size() * sizeof(float));
    memcpy(indices, g_last_mesh->indices.data(),
           g_last_mesh->indices.size() * sizeof(int32_t));
}

void obj_copy_uvs(float* uvs) {
    if (!g_last_mesh) return;
    memcpy(uvs, g_last_mesh->uvs.data(),
           g_last_mesh->uvs.size() * sizeof(float));
}

void obj_free() {
    delete g_last_mesh;
    g_last_mesh = nullptr;
}

}  // extern "C"

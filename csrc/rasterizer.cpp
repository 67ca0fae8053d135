// Minimal z-buffer triangle rasterizer (CPU, C++).
//
// Replaces PyTorch3D's MeshRasterizer (C++/CUDA) for the temporal
// evaluator's GT-mesh visibility checks
// (reference: utils/binary_metrics_utils.py:336-358). Renders a depth
// (z-buffer) image of a triangle mesh under an OpenCV-convention pinhole
// camera: x_pix = K [R|t] X, with the +0.5 pixel-centre sampling used
// throughout the framework.
//
// Build: g++ -O3 -fopenmp -shared -fPIC rasterizer.cpp -o librasterizer.so
// Exposed via ctypes (implicit_depth_tpu/eval/rasterizer.py).
//
// Parallelism: OpenMP over vertices (transform/project) and faces
// (rasterise). The z-buffer race is avoided with one z-buffer per thread
// and a min-reduction — ScanNet GT meshes are 1-2 M faces and the
// temporal eval renders one per frame (binary_metrics_utils.py:336-358),
// so the faces loop is the wall on multi-core hosts. Honours
// OMP_NUM_THREADS; on a 1-core host this compiles to the serial path.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Transforms vertices to camera space and projects to pixel coords.
// cam: (n, 3) camera-space xyz; px/py: pixel coords (NaN behind camera).
void project_all(
    const float* verts, int64_t n_verts,
    const float* cam_T_world, const float* K,
    float* cam, float* px, float* py) {
  const float fx = K[0], cx = K[2];
  const float fy = K[4], cy = K[5];
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_verts; ++i) {
    const float x = verts[i * 3 + 0];
    const float y = verts[i * 3 + 1];
    const float z = verts[i * 3 + 2];
    const float cxp = cam_T_world[0] * x + cam_T_world[1] * y + cam_T_world[2] * z + cam_T_world[3];
    const float cyp = cam_T_world[4] * x + cam_T_world[5] * y + cam_T_world[6] * z + cam_T_world[7];
    const float czp = cam_T_world[8] * x + cam_T_world[9] * y + cam_T_world[10] * z + cam_T_world[11];
    cam[i * 3 + 0] = cxp;
    cam[i * 3 + 1] = cyp;
    cam[i * 3 + 2] = czp;
    if (czp > 1e-6f) {
      px[i] = fx * cxp / czp + cx;
      py[i] = fy * cyp / czp + cy;
    } else {
      px[i] = std::numeric_limits<float>::quiet_NaN();
      py[i] = std::numeric_limits<float>::quiet_NaN();
    }
  }
}

}  // namespace

extern "C" {

// verts: (n_verts, 3) float32 world coords
// faces: (n_faces, 3) int32 vertex indices
// cam_T_world: (4, 4) row-major float32
// K: (3, 3) row-major float32 (intrinsics at the output resolution)
// out_depth: (height, width) float32, 0 where no geometry
void rasterize_depth(
    const float* verts, int64_t n_verts,
    const int32_t* faces, int64_t n_faces,
    const float* cam_T_world,
    const float* K,
    int32_t height, int32_t width,
    float* out_depth) {
  // transform all vertices to camera space and project
  float* cam = new float[n_verts * 3];
  float* px = new float[n_verts];
  float* py = new float[n_verts];
  project_all(verts, n_verts, cam_T_world, K, cam, px, py);

  const int64_t npix = (int64_t)height * width;
  for (int64_t i = 0; i < npix; ++i) out_depth[i] = 0.0f;

#ifdef _OPENMP
  const int max_threads = omp_get_max_threads();
#else
  const int max_threads = 1;
#endif
  // one z-buffer per extra thread; thread 0 writes out_depth directly
  std::vector<std::vector<float>> thread_bufs;
  if (max_threads > 1) {
    thread_bufs.resize(max_threads - 1);
    for (auto& b : thread_bufs) b.assign(npix, 0.0f);
  }

#pragma omp parallel for schedule(dynamic, 1024)
  for (int64_t f = 0; f < n_faces; ++f) {
#ifdef _OPENMP
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    float* zbuf = tid == 0 ? out_depth : thread_bufs[tid - 1].data();
    const int32_t i0 = faces[f * 3 + 0];
    const int32_t i1 = faces[f * 3 + 1];
    const int32_t i2 = faces[f * 3 + 2];
    const float z0 = cam[i0 * 3 + 2], z1 = cam[i1 * 3 + 2], z2 = cam[i2 * 3 + 2];
    if (z0 <= 1e-6f || z1 <= 1e-6f || z2 <= 1e-6f) continue;  // clip behind

    const float x0 = px[i0], y0 = py[i0];
    const float x1 = px[i1], y1 = py[i1];
    const float x2 = px[i2], y2 = py[i2];

    // pixel-centre sample positions are (u + 0.5, v + 0.5)
    int32_t umin = (int32_t)std::floor(std::min({x0, x1, x2}) - 0.5f);
    int32_t umax = (int32_t)std::ceil(std::max({x0, x1, x2}) - 0.5f);
    int32_t vmin = (int32_t)std::floor(std::min({y0, y1, y2}) - 0.5f);
    int32_t vmax = (int32_t)std::ceil(std::max({y0, y1, y2}) - 0.5f);
    umin = std::max(umin, 0);
    vmin = std::max(vmin, 0);
    umax = std::min(umax, width - 1);
    vmax = std::min(vmax, height - 1);
    if (umin > umax || vmin > vmax) continue;

    const float area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
    if (std::fabs(area) < 1e-12f) continue;
    const float inv_area = 1.0f / area;
    const float iz0 = 1.0f / z0, iz1 = 1.0f / z1, iz2 = 1.0f / z2;

    for (int32_t v = vmin; v <= vmax; ++v) {
      const float sy = v + 0.5f;
      for (int32_t u = umin; u <= umax; ++u) {
        const float sx = u + 0.5f;
        float w0 = ((x1 - sx) * (y2 - sy) - (x2 - sx) * (y1 - sy)) * inv_area;
        float w1 = ((x2 - sx) * (y0 - sy) - (x0 - sx) * (y2 - sy)) * inv_area;
        float w2 = 1.0f - w0 - w1;
        // small tolerance so shared-edge pixels are not dropped by
        // both adjacent triangles due to rounding
        const float eps = -1e-5f;
        if (w0 < eps || w1 < eps || w2 < eps) continue;
        // perspective-correct depth: interpolate 1/z in screen space
        const float iz = w0 * iz0 + w1 * iz1 + w2 * iz2;
        const float z = 1.0f / iz;
        float* d = &zbuf[(int64_t)v * width + u];
        if (*d == 0.0f || z < *d) *d = z;
      }
    }
  }

  // min-reduce the per-thread z-buffers into out_depth (0 = empty)
  for (const auto& buf : thread_bufs) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < npix; ++i) {
      const float z = buf[i];
      if (z > 0.0f && (out_depth[i] == 0.0f || z < out_depth[i])) out_depth[i] = z;
    }
  }

  delete[] cam;
  delete[] px;
  delete[] py;
}

// Fused per-frame vertex-visibility update for the temporal evaluator
// (reference: utils/binary_metrics_utils.py:360-388). Equivalent to
// rasterize_depth + project_vertices + the numpy sampling chain in
// TemporalEvaluator.update_vertex_predictions, in ONE call with no
// million-element host temporaries:
//   out[i] = pred[v, u]  if the vertex projects in-bounds (outside the
//            edge_size border), its camera depth matches the z-buffer
//            within 5 cm, and the sampled prediction is > 0;
//          = -1 otherwise.
void sample_vertex_predictions(
    const float* verts, int64_t n_verts,
    const int32_t* faces, int64_t n_faces,
    const float* cam_T_world,
    const float* K,
    const float* pred,  // (height, width) float32, model prediction
    int32_t height, int32_t width, int32_t edge_size,
    float* out_pred) {  // (n_verts,) float32
  // z-buffer reuses the exact rasterize_depth path (shared projection)
  float* zbuf = new float[(int64_t)height * width];
  rasterize_depth(verts, n_verts, faces, n_faces, cam_T_world, K,
                  height, width, zbuf);

  const float fx = K[0], cx = K[2];
  const float fy = K[4], cy = K[5];
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_verts; ++i) {
    const float x = verts[i * 3 + 0];
    const float y = verts[i * 3 + 1];
    const float z = verts[i * 3 + 2];
    const float czp = cam_T_world[8] * x + cam_T_world[9] * y + cam_T_world[10] * z + cam_T_world[11];
    out_pred[i] = -1.0f;
    if (czp <= 1e-6f) continue;  // behind camera (z>0 test)
    const float cxp = cam_T_world[0] * x + cam_T_world[1] * y + cam_T_world[2] * z + cam_T_world[3];
    const float cyp = cam_T_world[4] * x + cam_T_world[5] * y + cam_T_world[6] * z + cam_T_world[7];
    // same rounding as the numpy path: round(u - 0.5) with banker's
    // rounding is rint; numpy's np.round is rint (half-to-even)
    const float uf = fx * cxp / czp + cx;
    const float vf = fy * cyp / czp + cy;
    const int64_t u = (int64_t)std::nearbyint(uf - 0.5f);
    const int64_t v = (int64_t)std::nearbyint(vf - 0.5f);
    if (u < 0 || u >= width || v < 0 || v >= height) continue;  // inb
    // edge mask: border pixels carry pred = -1
    const bool masked = (u < edge_size || u >= width - edge_size ||
                         v < edge_size || v >= height - edge_size);
    const float sampled_z = zbuf[v * width + u];
    if (sampled_z <= 0.0f) continue;
    if (std::fabs(czp - sampled_z) >= 0.05f) continue;
    const float p = masked ? -1.0f : pred[v * width + u];
    if (p > 0.0f) out_pred[i] = p;
  }
  delete[] zbuf;
}

// Projects vertices into the camera: out (n_verts, 3) = (u, v, z_cam).
void project_vertices(
    const float* verts, int64_t n_verts,
    const float* cam_T_world,
    const float* K,
    float* out_uvz) {
  const float fx = K[0], cx = K[2];
  const float fy = K[4], cy = K[5];
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_verts; ++i) {
    const float x = verts[i * 3 + 0];
    const float y = verts[i * 3 + 1];
    const float z = verts[i * 3 + 2];
    const float cxp = cam_T_world[0] * x + cam_T_world[1] * y + cam_T_world[2] * z + cam_T_world[3];
    const float cyp = cam_T_world[4] * x + cam_T_world[5] * y + cam_T_world[6] * z + cam_T_world[7];
    const float czp = cam_T_world[8] * x + cam_T_world[9] * y + cam_T_world[10] * z + cam_T_world[11];
    if (czp > 1e-6f) {
      out_uvz[i * 3 + 0] = fx * cxp / czp + cx;
      out_uvz[i * 3 + 1] = fy * cyp / czp + cy;
      out_uvz[i * 3 + 2] = czp;
    } else {
      out_uvz[i * 3 + 0] = -1e9f;
      out_uvz[i * 3 + 1] = -1e9f;
      out_uvz[i * 3 + 2] = -1.0f;
    }
  }
}

}  // extern "C"

// Z-buffer triangle rasterizer: mesh -> per-view depth maps.
//
// Native replacement for the reference's pyrender/OpenGL offscreen renderer
// (mv3d/eval/meshtodepth.py:6-58), used for GT-visibility masking, depth
// eval of volumetric methods, and mesh trimming.  Host-side C++ (this is I/O
// -adjacent eval tooling, not TPU compute).  Perspective-correct depth via
// screen-space-linear 1/z; triangles are clipped against the near plane.
//
// Build: g++ -O3 -shared -fPIC -o librasterizer.so rasterizer.cpp
#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct V3 { float x, y, z; };

constexpr float kNear = 1e-4f;

inline V3 lerp(const V3& a, const V3& b, float t) {
  return {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y), a.z + t * (b.z - a.z)};
}

// Clip a camera-space triangle against z > kNear (Sutherland-Hodgman).
// Returns 0..2 output triangles in `out`.
int clip_near(const V3 in[3], V3 out[2][3]) {
  V3 poly[4];
  int n = 0;
  for (int i = 0; i < 3; ++i) {
    const V3& a = in[i];
    const V3& b = in[(i + 1) % 3];
    const bool ain = a.z > kNear, bin = b.z > kNear;
    if (ain) poly[n++] = a;
    if (ain != bin) {
      const float t = (kNear - a.z) / (b.z - a.z);
      poly[n++] = lerp(a, b, t);
    }
  }
  if (n < 3) return 0;
  out[0][0] = poly[0]; out[0][1] = poly[1]; out[0][2] = poly[2];
  if (n == 3) return 1;
  out[1][0] = poly[0]; out[1][1] = poly[2]; out[1][2] = poly[3];
  return 2;
}

void raster_tri(const V3 cam[3], const float* K, int H, int W, float* depth) {
  const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  float px[3], py[3], pw[3];
  for (int i = 0; i < 3; ++i) {
    pw[i] = 1.0f / cam[i].z;
    px[i] = fx * cam[i].x * pw[i] + cx;
    py[i] = fy * cam[i].y * pw[i] + cy;
  }
  int x0 = std::max(0, (int)std::floor(std::min({px[0], px[1], px[2]})));
  int x1 = std::min(W - 1, (int)std::ceil(std::max({px[0], px[1], px[2]})));
  int y0 = std::max(0, (int)std::floor(std::min({py[0], py[1], py[2]})));
  int y1 = std::min(H - 1, (int)std::ceil(std::max({py[0], py[1], py[2]})));
  if (x0 > x1 || y0 > y1) return;

  const float ax = px[1] - px[0], ay = py[1] - py[0];
  const float bx = px[2] - px[0], by = py[2] - py[0];
  const float det = ax * by - ay * bx;
  if (std::fabs(det) < 1e-12f) return;
  const float inv_det = 1.0f / det;

  for (int y = y0; y <= y1; ++y) {
    for (int x = x0; x <= x1; ++x) {
      const float qx = x - px[0], qy = y - py[0];
      const float l1 = (qx * by - qy * bx) * inv_det;
      const float l2 = (ax * qy - ay * qx) * inv_det;
      const float l0 = 1.0f - l1 - l2;
      if (l0 < -1e-6f || l1 < -1e-6f || l2 < -1e-6f) continue;
      const float w = l0 * pw[0] + l1 * pw[1] + l2 * pw[2];
      if (w <= 0) continue;
      const float z = 1.0f / w;
      float& d = depth[y * W + x];
      if (d == 0.0f || z < d) d = z;
    }
  }
}

}  // namespace

extern "C" {

// verts: [n_verts, 3] world; faces: [n_faces, 3]; K: [3,3] row-major;
// pose: [4,4] row-major world->cam; out_depth: [H, W] zero-initialized.
void rasterize_depth(const float* verts, int n_verts, const int* faces,
                     int n_faces, const float* K, const float* pose, int H,
                     int W, float* out_depth) {
  std::memset(out_depth, 0, sizeof(float) * H * W);
  std::vector<V3> cam(n_verts);
  for (int i = 0; i < n_verts; ++i) {
    const float X = verts[3 * i], Y = verts[3 * i + 1], Z = verts[3 * i + 2];
    cam[i].x = pose[0] * X + pose[1] * Y + pose[2] * Z + pose[3];
    cam[i].y = pose[4] * X + pose[5] * Y + pose[6] * Z + pose[7];
    cam[i].z = pose[8] * X + pose[9] * Y + pose[10] * Z + pose[11];
  }
  for (int t = 0; t < n_faces; ++t) {
    const V3 tri[3] = {cam[faces[3 * t]], cam[faces[3 * t + 1]],
                       cam[faces[3 * t + 2]]};
    if (tri[0].z <= kNear && tri[1].z <= kNear && tri[2].z <= kNear) continue;
    V3 clipped[2][3];
    const int n = clip_near(tri, clipped);
    for (int i = 0; i < n; ++i) raster_tri(clipped[i], K, H, W, out_depth);
  }
}

}  // extern "C"

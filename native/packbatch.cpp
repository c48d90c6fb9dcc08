// vmg_tpu native data path: clip assembly from packed shards.
//
// The hot host-side loop of training data loading -- gather T frames from
// the memory-mapped shard, crop, flip/rotate, and convert uint8 -> float32
// in one pass -- implemented in C++ (the reference reaches this through
// torch DataLoader workers + cv2; here one fused pass per clip, OpenMP
// over frames).  Exposed through a C ABI for ctypes (no pybind11 in this
// toolchain).
//
// Build: tools/build_native.sh  ->  native/libpackbatch.so

#include <cstdint>
#include <cstring>

extern "C" {

// Assemble one clip:
//   data        : base pointer of the packed shard (uint8 HWC frames)
//   H, W, C     : stored frame shape
//   frame_idx   : T frame indices (frame f starts at f * H*W*C)
//   T           : number of frames
//   cy, cx      : crop top-left (in stored coordinates)
//   ch, cw      : crop size
//   hflip,vflip : mirror flags (applied to the crop)
//   rot90       : transpose H/W after flips (matches the reference's
//                 img.transpose(1, 0, 2) augmentation, data/REDS.py:124-141)
//   out         : float32 buffer, (T, ch, cw, C) or (T, cw, ch, C) if rot90
// Returns 0 on success.
int assemble_clip(const uint8_t* data, int64_t H, int64_t W, int64_t C,
                  const int64_t* frame_idx, int64_t T,
                  int64_t cy, int64_t cx, int64_t ch, int64_t cw,
                  int hflip, int vflip, int rot90,
                  float* out) {
  if (cy < 0 || cx < 0 || cy + ch > H || cx + cw > W) return 1;
  const int64_t frame_bytes = H * W * C;
  const int64_t out_h = rot90 ? cw : ch;
  const int64_t out_w = rot90 ? ch : cw;

#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < T; ++t) {
    const uint8_t* frame = data + frame_idx[t] * frame_bytes;
    float* dst_frame = out + t * out_h * out_w * C;
    for (int64_t y = 0; y < ch; ++y) {
      // source row within the crop, after vertical flip
      const int64_t sy = cy + (vflip ? (ch - 1 - y) : y);
      const uint8_t* src_row = frame + (sy * W + cx) * C;
      for (int64_t x = 0; x < cw; ++x) {
        const int64_t sx = hflip ? (cw - 1 - x) : x;
        const uint8_t* px = src_row + sx * C;
        // rot90 == transpose(H, W): out[x][y] = in[y][x]
        float* dst = rot90 ? dst_frame + (x * out_w + y) * C
                           : dst_frame + (y * out_w + x) * C;
        for (int64_t c = 0; c < C; ++c) dst[c] = px[c] / 255.0f;
      }
    }
  }
  return 0;
}

// Batched variant: assemble B independent clips in one call (threads over
// B*T work items).  Arrays are flat: frame_idx (B*T), crops (B*4: cy,cx
// and flags packed per sample as cy,cx,hflip|vflip<<1|rot90<<2, pad).
int assemble_batch(const uint8_t* data, int64_t H, int64_t W, int64_t C,
                   const int64_t* frame_idx, int64_t B, int64_t T,
                   const int64_t* crops,  // (B, 4): cy, cx, flags, unused
                   int64_t ch, int64_t cw,
                   float* out) {
  int rc = 0;
#pragma omp parallel for schedule(dynamic)
  for (int64_t b = 0; b < B; ++b) {
    const int64_t cy = crops[b * 4 + 0];
    const int64_t cx = crops[b * 4 + 1];
    const int64_t flags = crops[b * 4 + 2];
    const int hflip = flags & 1, vflip = (flags >> 1) & 1,
              rot90 = (flags >> 2) & 1;
    const int64_t out_h = rot90 ? cw : ch;
    const int64_t out_w = rot90 ? ch : cw;
    int r = assemble_clip(data, H, W, C, frame_idx + b * T, T, cy, cx, ch,
                          cw, hflip, vflip, rot90,
                          out + b * T * out_h * out_w * C);
    if (r != 0) rc = r;
  }
  return rc;
}

}  // extern "C"

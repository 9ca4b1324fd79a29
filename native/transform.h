// Shared native image transform: JPEG decode -> PIL-parity triangle-filter
// resize of the shorter edge -> center crop, as uint8 HWC. Implemented in
// image_pipeline.cc; consumed by the batch data plane (vqa_process_batch)
// and the serving front (serve_front.cc).
#ifndef VQA_NATIVE_TRANSFORM_H_
#define VQA_NATIVE_TRANSFORM_H_

#include <cstddef>
#include <cstdint>

namespace vqa {

// Full reference transform from a JPEG file on disk into
// out[image_size*image_size*3] (uint8, HWC). Returns false on any decode
// or allocation failure; never throws and never longjmps past the caller.
bool TransformFile(const char* path, int image_size, double central_fraction,
                   uint8_t* out);

// Same transform from an in-memory JPEG byte buffer (serving path: the
// request body's base64-decoded image never touches disk).
bool TransformMem(const uint8_t* data, size_t len, int image_size,
                  double central_fraction, uint8_t* out);

}  // namespace vqa

#endif  // VQA_NATIVE_TRANSFORM_H_

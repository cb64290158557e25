// Native .klg log loader: zlib depth inflate + JPEG colour decode with a
// background prefetch thread.
//
// TPU-native counterpart of the reference's C++ readers
// (GUI/Tools/KlgLogReader.cpp: fread + zlib uncompress + JPEGLoader;
// GUI/Tools/ImageLogReader.cpp's buffering thread): frame decode runs off the
// Python thread so host decode overlaps device compute, which matters once
// the device step is tens of milliseconds. Exposed as a C ABI consumed via
// ctypes (multimotionfusion_tpu/io/native.py); the pure-Python reader remains
// the fallback when this library is not built.
//
// Format per frame (KlgLogReader.cpp:59-90):
//   int64 timestamp; int32 depth_bytes; int32 rgb_bytes;
//   depth payload (zlib'd uint16 mm, or raw when depth_bytes == w*h*2);
//   rgb payload (JPEG, or raw BGR when rgb_bytes == w*h*3).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <zlib.h>

namespace {

struct Frame {
  int64_t timestamp = 0;
  std::vector<float> depth;  // metres, h*w
  std::vector<uint8_t> rgb;  // RGB, h*w*3
};

struct Reader {
  FILE* fp = nullptr;
  int width = 0, height = 0;
  int32_t num_frames = 0;

  static constexpr int kRing = 4;
  Frame ring[kRing];
  // all ring indices guarded by mu
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  int produced = 0;
  int consumed = 0;
  bool finished = false;
  bool stop = false;
  std::thread worker;

  std::vector<uint8_t> depth_raw, rgb_raw;

  bool decode_one(Frame& f) {
    int64_t ts;
    int32_t dsize, csize;
    if (fread(&ts, sizeof(ts), 1, fp) != 1) return false;
    if (fread(&dsize, sizeof(dsize), 1, fp) != 1) return false;
    if (fread(&csize, sizeof(csize), 1, fp) != 1) return false;
    depth_raw.resize(dsize);
    if (dsize > 0 && fread(depth_raw.data(), 1, dsize, fp) != size_t(dsize))
      return false;
    rgb_raw.resize(csize);
    if (csize > 0 && fread(rgb_raw.data(), 1, csize, fp) != size_t(csize))
      return false;

    const int n = width * height;
    f.timestamp = ts;
    f.depth.resize(n);
    f.rgb.assign(size_t(n) * 3, 0);

    // depth: zlib'd or raw uint16 millimetres
    std::vector<uint16_t> mm(n);
    if (dsize == n * 2) {
      memcpy(mm.data(), depth_raw.data(), size_t(n) * 2);
    } else {
      uLongf dst_len = uLongf(n) * 2;
      if (uncompress(reinterpret_cast<Bytef*>(mm.data()), &dst_len,
                     depth_raw.data(), dsize) != Z_OK)
        return false;
    }
    for (int i = 0; i < n; i++) f.depth[i] = float(mm[i]) * 0.001f;

    // colour: raw BGR or JPEG (both converted to RGB)
    if (csize == n * 3) {
      for (int i = 0; i < n; i++) {
        f.rgb[i * 3 + 0] = rgb_raw[i * 3 + 2];
        f.rgb[i * 3 + 1] = rgb_raw[i * 3 + 1];
        f.rgb[i * 3 + 2] = rgb_raw[i * 3 + 0];
      }
    } else if (csize > 0) {
      jpeg_decompress_struct cinfo;
      jpeg_error_mgr jerr;
      cinfo.err = jpeg_std_error(&jerr);
      jpeg_create_decompress(&cinfo);
      jpeg_mem_src(&cinfo, rgb_raw.data(), csize);
      if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return false;
      }
      cinfo.out_color_space = JCS_RGB;
      jpeg_start_decompress(&cinfo);
      if (int(cinfo.output_width) == width &&
          int(cinfo.output_height) == height) {
        while (cinfo.output_scanline < cinfo.output_height) {
          JSAMPROW row =
              f.rgb.data() + size_t(cinfo.output_scanline) * width * 3;
          jpeg_read_scanlines(&cinfo, &row, 1);
        }
      }
      jpeg_finish_decompress(&cinfo);
      jpeg_destroy_decompress(&cinfo);
    }
    return true;
  }

  void run() {
    int decoded = 0;
    while (true) {
      std::unique_lock<std::mutex> lk(mu);
      cv_produce.wait(lk, [&] { return stop || produced - consumed < kRing; });
      if (stop) return;
      if (decoded >= num_frames) {
        finished = true;
        cv_consume.notify_all();
        return;
      }
      Frame& f = ring[produced % kRing];
      lk.unlock();
      bool ok = decode_one(f);  // file IO + decode outside the lock
      lk.lock();
      if (!ok) {
        finished = true;
        cv_consume.notify_all();
        return;
      }
      decoded++;
      produced++;
      cv_consume.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* klg_open(const char* path, int width, int height) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return nullptr;
  auto* r = new Reader();
  r->fp = fp;
  r->width = width;
  r->height = height;
  if (fread(&r->num_frames, sizeof(int32_t), 1, fp) != 1) {
    fclose(fp);
    delete r;
    return nullptr;
  }
  r->worker = std::thread([r] { r->run(); });
  return r;
}

int klg_num_frames(void* handle) {
  return static_cast<Reader*>(handle)->num_frames;
}

// Blocks until the next prefetched frame is ready; copies it out.
// Returns 1 on success, 0 at end of log / error.
int klg_next(void* handle, int64_t* timestamp, float* depth_out,
             uint8_t* rgb_out) {
  auto* r = static_cast<Reader*>(handle);
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_consume.wait(
      lk, [&] { return r->stop || r->finished || r->produced > r->consumed; });
  if (r->produced <= r->consumed) return 0;
  Frame& f = r->ring[r->consumed % Reader::kRing];
  *timestamp = f.timestamp;
  memcpy(depth_out, f.depth.data(), f.depth.size() * sizeof(float));
  memcpy(rgb_out, f.rgb.data(), f.rgb.size());
  r->consumed++;
  r->cv_produce.notify_one();
  return 1;
}

void klg_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  {
    std::lock_guard<std::mutex> lk(r->mu);
    r->stop = true;
  }
  r->cv_produce.notify_all();
  r->cv_consume.notify_all();
  if (r->worker.joinable()) r->worker.join();
  if (r->fp) fclose(r->fp);
  delete r;
}

}  // extern "C"

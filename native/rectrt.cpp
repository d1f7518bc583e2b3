// rectrt — native host runtime for rectdetect_tpu.
//
// The reference's host runtime is C (helper.c / oclhelper.c): timing,
// pinned staging buffers, a persisted per-device autotune plan, and the
// capture loop lives in the C++ apps (vidrect.cpp).  This library is the
// TPU build's equivalent: a threaded OpenCV capture pump feeding a ring of
// preallocated frame buffers (so decode/copy overlaps device compute and
// Python never blocks on I/O), BGR->packed-Lab staging conversion (LUT
// fixed-point, mirroring srgb2plab oclimgutil.cl:106-134), a video writer,
// wall-clock helpers (helper.c:104-121), and the plan-cache file format
// (loadPlan/savePlan, oclhelper.c:394-527).
//
// Exposed as a plain C ABI for ctypes; rectdetect_tpu/runtime/native.py
// wraps it with a pure-Python fallback.

#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/videoio.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

extern "C" {

// ---------------------------------------------------------------- time ----

uint64_t rectrt_time_ms() {
  return std::chrono::duration_cast<std::chrono::milliseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

void rectrt_sleep_ms(int ms) {
  std::this_thread::sleep_for(std::chrono::milliseconds(ms));
}

// ------------------------------------------------------------ plan cache --
// File format mirrors plan.txt (oclhelper.c:394-527): sections keyed by a
// sanitized device name, "key value" lines.  Other devices' sections are
// preserved on save.

static std::string sanitize(const std::string &s) {
  std::string r;
  for (char c : s) r += (c == ' ' || c == '\t' || c == '\n') ? '_' : c;
  return r;
}

static std::map<std::string, std::map<std::string, std::string>>
read_plan(const char *path) {
  std::map<std::string, std::map<std::string, std::string>> all;
  std::ifstream f(path);
  std::string line, cur;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    if (line[0] == '[') {
      size_t e = line.find(']');
      cur = line.substr(1, e == std::string::npos ? line.size() - 1 : e - 1);
    } else if (!cur.empty()) {
      size_t sp = line.find(' ');
      if (sp != std::string::npos)
        all[cur][line.substr(0, sp)] = line.substr(sp + 1);
    }
  }
  return all;
}

// Returns the device's section as "key value\n..." into buf; result length
// (or 0 if absent, -1 if buf too small).
int rectrt_plan_load(const char *path, const char *device, char *buf,
                     int buflen) {
  auto all = read_plan(path);
  auto it = all.find(sanitize(device));
  if (it == all.end()) return 0;
  std::string out;
  for (auto &kv : it->second) out += kv.first + " " + kv.second + "\n";
  if ((int)out.size() + 1 > buflen) return -1;
  std::memcpy(buf, out.c_str(), out.size() + 1);
  return (int)out.size();
}

// content: "key value\n..." lines; other devices' sections preserved.
int rectrt_plan_save(const char *path, const char *device,
                     const char *content) {
  auto all = read_plan(path);
  auto &sec = all[sanitize(device)];
  sec.clear();
  std::istringstream is(content);
  std::string line;
  while (std::getline(is, line)) {
    size_t sp = line.find(' ');
    if (sp != std::string::npos) sec[line.substr(0, sp)] = line.substr(sp + 1);
  }
  std::ofstream f(path, std::ios::trunc);
  if (!f) return -1;
  for (auto &s : all) {
    f << "[" << s.first << "]\n";
    for (auto &kv : s.second) f << kv.first << " " << kv.second << "\n";
  }
  return 0;
}

// ------------------------------------------------- packed-Lab staging -----
// Host-side BGR -> packed Lab (L:12b | a:10b | b:10b), same lattice as the
// device path (core/color.py; packlab oclimgutil.cl:28-34).  LUT for the
// sRGB EOTF like the reference's s2l table (oclimgutil.cl:661-695).

static float s2l_lut[256];
static std::once_flag s2l_once;

static void init_s2l() {
  for (int i = 0; i < 256; i++) {
    float s = i / 255.0f;
    s2l_lut[i] =
        s <= 0.04045f ? s / 12.92f : std::pow((s + 0.055f) / 1.055f, 2.4f);
  }
}

static inline float lab_f(float t) {
  return t > 0.008856f ? std::cbrt(t) : 7.787f * t + 16.0f / 116.0f;
}

void rectrt_bgr_to_packedlab(const uint8_t *bgr, int32_t *out, int n,
                             int n_threads) {
  std::call_once(s2l_once, init_s2l);
  if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
  auto work = [&](int t0, int t1) {
    for (int i = t0; i < t1; i++) {
      float b = s2l_lut[bgr[i * 3 + 0]];
      float g = s2l_lut[bgr[i * 3 + 1]];
      float r = s2l_lut[bgr[i * 3 + 2]];
      float x = (0.412453f * r + 0.357580f * g + 0.180423f * b) / 0.950456f;
      float y = 0.212671f * r + 0.715160f * g + 0.072169f * b;
      float z = (0.019334f * r + 0.119193f * g + 0.950227f * b) / 1.088754f;
      float fx = lab_f(x), fy = lab_f(y), fz = lab_f(z);
      float L = y > 0.008856f ? 116.0f * fy - 16.0f : 903.3f * y;
      float A = 500.0f * (fx - fy);
      float B = 200.0f * (fy - fz);
      float lf = L * (1.0f / 256.0f);
      float af = (A + 128.0f) * (1.0f / 256.0f);
      float bf = (B + 128.0f) * (1.0f / 256.0f);
      auto clampi = [](int v, int hi) { return v < 0 ? 0 : (v > hi ? hi : v); };
      int cl = clampi((int)std::floor(lf * 4096.0f), 4095);
      int ca = clampi((int)std::floor(af * 1024.0f), 1023);
      int cb = clampi((int)std::floor(bf * 1024.0f), 1023);
      out[i] = (cb << 22) | (ca << 12) | cl;
    }
  };
  if (n_threads <= 1 || n < (1 << 15)) {
    work(0, n);
    return;
  }
  std::vector<std::thread> th;
  int chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int a = t * chunk, b = std::min(n, a + chunk);
    if (a < b) th.emplace_back(work, a, b);
  }
  for (auto &t : th) t.join();
}

// ------------------------------------------------------------ frame pump --
// Threaded capture into a ring of preallocated BGR frames.  The capture
// thread always overwrites the oldest slot (realtime semantics: consumers
// get the freshest frame, like the reference's grab/retrieve overlap,
// vidrect.cpp:159-172).

struct Pump {
  cv::VideoCapture cap;
  std::thread thread;
  std::mutex mu;
  std::condition_variable cv_;
  std::vector<std::vector<uint8_t>> ring;
  int w = 0, h = 0, ring_n = 0;
  bool drop = true;           // realtime: overwrite; else backpressure
  std::atomic<long> seq{0};   // total frames captured
  long consumed = 0;
  std::atomic<bool> stop{false};
  std::atomic<bool> eof{false};

  void run() {
    cv::Mat frame;
    while (!stop.load()) {
      if (!cap.read(frame)) {
        eof.store(true);
        cv_.notify_all();
        return;
      }
      if (frame.cols != w || frame.rows != h) {
        cv::resize(frame, frame, cv::Size(w, h));
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        if (!drop) {
          cv_.wait(lk, [&] {
            return stop.load() || seq.load() - consumed < ring_n;
          });
          if (stop.load()) return;
        }
        long s = seq.load();
        auto &slot = ring[s % ring_n];
        std::memcpy(slot.data(), frame.data, (size_t)w * h * 3);
        seq.store(s + 1);
      }
      cv_.notify_all();
    }
  }
};

void *rectrt_pump_open(const char *spec, int cam_w, int cam_h, int ring_n,
                       int drop) {
  auto *p = new Pump();
  std::string s = spec ? spec : "";
  if (s.rfind("cam:", 0) == 0) {
    int id = 0, w = 0, h = 0;
    std::sscanf(s.c_str(), "cam:%d,%d,%d", &id, &w, &h);
    p->cap.open(id);
    if (p->cap.isOpened() && w && h) {
      p->cap.set(cv::CAP_PROP_FRAME_WIDTH, w);
      p->cap.set(cv::CAP_PROP_FRAME_HEIGHT, h);
    }
  } else if (!s.empty()) {
    p->cap.open(s);
  } else {
    p->cap.open(0);
  }
  if (!p->cap.isOpened()) {
    delete p;
    return nullptr;
  }
  p->w = (int)p->cap.get(cv::CAP_PROP_FRAME_WIDTH);
  p->h = (int)p->cap.get(cv::CAP_PROP_FRAME_HEIGHT);
  if (cam_w && cam_h && (p->w != cam_w || p->h != cam_h)) {
    p->w = cam_w;
    p->h = cam_h;
  }
  p->ring_n = ring_n > 0 ? ring_n : 4;
  p->drop = drop != 0;
  p->ring.assign(p->ring_n, std::vector<uint8_t>((size_t)p->w * p->h * 3));
  p->thread = std::thread(&Pump::run, p);
  return p;
}

int rectrt_pump_width(void *vp) { return ((Pump *)vp)->w; }
int rectrt_pump_height(void *vp) { return ((Pump *)vp)->h; }

// Copy the next frame into out.  drop mode: the NEWEST unconsumed frame
// (returns frames skipped >= 0); lossless mode: the OLDEST unconsumed
// (always returns 0).  -1 on timeout, -2 on end of stream.
int rectrt_pump_next(void *vp, uint8_t *out, int timeout_ms) {
  auto *p = (Pump *)vp;
  std::unique_lock<std::mutex> lk(p->mu);
  if (!p->cv_.wait_for(lk, std::chrono::milliseconds(timeout_ms), [&] {
        return p->seq.load() > p->consumed || p->eof.load();
      }))
    return -1;
  long s = p->seq.load();
  if (s <= p->consumed) return -2;  // eof with nothing new
  long pick = p->drop ? s - 1 : p->consumed;
  int skipped = (int)(pick - p->consumed);
  std::memcpy(out, p->ring[pick % p->ring_n].data(),
              (size_t)p->w * p->h * 3);
  p->consumed = pick + 1;
  lk.unlock();
  p->cv_.notify_all();  // wake a backpressured capture thread
  return skipped;
}

void rectrt_pump_close(void *vp) {
  auto *p = (Pump *)vp;
  p->stop.store(true);
  p->cv_.notify_all();
  if (p->thread.joinable()) p->thread.join();
  delete p;
}

// ---------------------------------------------------------------- writer --

struct Writer {
  cv::VideoWriter w;
  int iw, ih;
};

void *rectrt_writer_open(const char *path, int w, int h, double fps) {
  auto *wr = new Writer{{}, w, h};
  wr->w.open(path, cv::VideoWriter::fourcc('P', 'I', 'M', '1'), fps,
             cv::Size(w, h), true);
  if (!wr->w.isOpened())
    wr->w.open(path, cv::VideoWriter::fourcc('m', 'p', '4', 'v'), fps,
               cv::Size(w, h), true);
  if (!wr->w.isOpened()) {
    delete wr;
    return nullptr;
  }
  return wr;
}

int rectrt_writer_write(void *vw, const uint8_t *bgr) {
  auto *wr = (Writer *)vw;
  cv::Mat m(wr->ih, wr->iw, CV_8UC3, (void *)bgr);
  wr->w.write(m);
  return 0;
}

void rectrt_writer_close(void *vw) {
  auto *wr = (Writer *)vw;
  wr->w.release();
  delete wr;
}

}  // extern "C"

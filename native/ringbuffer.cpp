// Lock-free SPSC float ring buffer for the realtime audio duplex path
// (reference infer/lib/audio.py:206 AudioIoProcess: a separate OS process
// with SharedMemory ring buffers + in/out/play pointers and over/underrun
// accounting; here the same double-buffered ring contract as a native
// library with a C ABI, bound from Python via ctypes —
// tpu_rvc/audio/native_ring.py).
//
// Single producer / single consumer: the audio-device callback writes the
// capture ring and reads the playback ring; the model loop does the
// opposite.  Block-aligned writes mirror the reference's underrun recovery
// (gui.py:1099-1126): when the writer falls behind the play pointer, it
// snaps the write position to the play pointer.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

extern "C" {

struct RingBuffer {
  float *data;
  uint64_t capacity;            // in samples (power of two not required)
  std::atomic<uint64_t> head;   // write index (absolute)
  std::atomic<uint64_t> tail;   // read index (absolute)
  std::atomic<uint64_t> overruns;
  std::atomic<uint64_t> underruns;
};

RingBuffer *rb_create(uint64_t capacity) {
  auto *rb = new (std::nothrow) RingBuffer;
  if (!rb) return nullptr;
  rb->data = new (std::nothrow) float[capacity]();
  if (!rb->data) {
    delete rb;
    return nullptr;
  }
  rb->capacity = capacity;
  rb->head.store(0);
  rb->tail.store(0);
  rb->overruns.store(0);
  rb->underruns.store(0);
  return rb;
}

void rb_destroy(RingBuffer *rb) {
  if (!rb) return;
  delete[] rb->data;
  delete rb;
}

uint64_t rb_readable(const RingBuffer *rb) {
  return rb->head.load(std::memory_order_acquire) -
         rb->tail.load(std::memory_order_acquire);
}

uint64_t rb_writable(const RingBuffer *rb) {
  return rb->capacity - rb_readable(rb);
}

// Write n samples; drops the OLDEST data on overflow (advances tail) so the
// stream stays realtime.  Returns samples accepted (always n).
uint64_t rb_write(RingBuffer *rb, const float *src, uint64_t n) {
  if (n > rb->capacity) {
    src += n - rb->capacity;
    n = rb->capacity;
    rb->overruns.fetch_add(1, std::memory_order_relaxed);
  }
  uint64_t head = rb->head.load(std::memory_order_relaxed);
  uint64_t tail = rb->tail.load(std::memory_order_acquire);
  if (head + n - tail > rb->capacity) {
    uint64_t drop = head + n - tail - rb->capacity;
    rb->tail.store(tail + drop, std::memory_order_release);
    rb->overruns.fetch_add(1, std::memory_order_relaxed);
  }
  for (uint64_t i = 0; i < n; i++)
    rb->data[(head + i) % rb->capacity] = src[i];
  rb->head.store(head + n, std::memory_order_release);
  return n;
}

// Read exactly n samples; zero-fills on underrun (and counts it).
uint64_t rb_read(RingBuffer *rb, float *dst, uint64_t n) {
  uint64_t tail = rb->tail.load(std::memory_order_relaxed);
  uint64_t head = rb->head.load(std::memory_order_acquire);
  uint64_t avail = head - tail;
  uint64_t take = avail < n ? avail : n;
  for (uint64_t i = 0; i < take; i++)
    dst[i] = rb->data[(tail + i) % rb->capacity];
  if (take < n) {
    memset(dst + take, 0, (n - take) * sizeof(float));
    rb->underruns.fetch_add(1, std::memory_order_relaxed);
  }
  rb->tail.store(tail + take, std::memory_order_release);
  return take;
}

uint64_t rb_overruns(const RingBuffer *rb) { return rb->overruns.load(); }
uint64_t rb_underruns(const RingBuffer *rb) { return rb->underruns.load(); }

}  // extern "C"

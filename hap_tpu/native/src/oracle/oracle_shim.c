/* ctypes-friendly shim around the ACTUAL reference decoder.
 *
 * The reference HapDecode (hap.c:993) requires a caller-supplied
 * HapDecodeCallback for multi-chunk frames (hap.h:113-128). This shim
 * supplies the canonical serial callback from the hap.h documentation and a
 * pthread fan-out variant, so Python can drive the real decoder through a
 * plain C ABI without constructing function pointers via ctypes.
 *
 * Compiled together with /root/reference/source/hap.c (read in place, never
 * copied into this repository) by hap_tpu/oracle.py. Test infrastructure
 * only — not part of the framework runtime.
 */

#include <pthread.h>
#include <stddef.h>

#include "hap.h"

static void serial_callback(HapDecodeWorkFunction function, void *p,
                            unsigned int count, void *info) {
    unsigned int i;
    (void)info;
    for (i = 0; i < count; i++) {
        function(p, i);
    }
}

struct work_slice {
    HapDecodeWorkFunction function;
    void *p;
    unsigned int begin;
    unsigned int end;
};

static void *work_thread(void *arg) {
    struct work_slice *s = (struct work_slice *)arg;
    unsigned int i;
    for (i = s->begin; i < s->end; i++) {
        s->function(s->p, i);
    }
    return NULL;
}

/* Fan chunks out over up to 4 real threads — exercises the reference's
 * multithreaded-decode contract (hap.h:113-116) rather than only the serial
 * degenerate case. */
static void threaded_callback(HapDecodeWorkFunction function, void *p,
                              unsigned int count, void *info) {
    enum { NTHREADS = 4 };
    pthread_t threads[NTHREADS];
    struct work_slice slices[NTHREADS];
    unsigned int per, i, n;
    (void)info;
    if (count <= 1) {
        serial_callback(function, p, count, info);
        return;
    }
    n = count < NTHREADS ? count : NTHREADS;
    per = (count + n - 1) / n;
    for (i = 0; i < n; i++) {
        slices[i].function = function;
        slices[i].p = p;
        slices[i].begin = i * per;
        slices[i].end = (i + 1) * per < count ? (i + 1) * per : count;
        pthread_create(&threads[i], NULL, work_thread, &slices[i]);
    }
    for (i = 0; i < n; i++) {
        pthread_join(threads[i], NULL);
    }
}

unsigned int oracle_decode(const void *inputBuffer,
                           unsigned long inputBufferBytes, unsigned int index,
                           int threaded, void *outputBuffer,
                           unsigned long outputBufferBytes,
                           unsigned long *outputBufferBytesUsed,
                           unsigned int *outputBufferTextureFormat) {
    return HapDecode(inputBuffer, inputBufferBytes, index,
                     threaded ? threaded_callback : serial_callback, NULL,
                     outputBuffer, outputBufferBytes, outputBufferBytesUsed,
                     outputBufferTextureFormat);
}

/* STREAM-triad-style memory-bandwidth probe, Spark-independent.
 *
 * Purpose (VERDICT r3, next-round #2): measure the single-socket memory
 * bandwidth ceiling of this host directly, so the 8->32-thread Spark
 * scaling reading (0.66-0.73) can be attributed to hardware rather than
 * engine quality without relying on Spark's own counters.
 *
 * Design: N threads, each pinned to its own core (CPU i), each owning
 * private a/b/c arrays of ELEMS doubles (3 x 64 MiB per thread >> LLC
 * share, so every pass streams from DRAM). After a barrier, every
 * thread runs REPS passes of the STREAM triad a[i] = b[i] + s*c[i];
 * aggregate bandwidth = nthreads * REPS * ELEMS * 24 bytes / wall time
 * (the STREAM convention: 2 reads + 1 write per element). The barrier
 * start + join end means the slowest thread bounds the figure - the
 * honest aggregate.
 *
 * Build: gcc -O3 -march=native -pthread -o bandwidth_probe bandwidth_probe.c
 * Run:   ./bandwidth_probe <nthreads> [elems] [reps]
 * Output: one JSON line {"threads":N,"gbps":X,...}
 */
#define _GNU_SOURCE
#include <pthread.h>
#include <sched.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

static long ELEMS = 8L * 1024 * 1024; /* doubles per array (64 MiB) */
static long REPS = 50;

static pthread_barrier_t barrier;

typedef struct {
    int cpu;
    double checksum;
} worker_arg;

static double now_sec(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

static void *worker(void *argp) {
    worker_arg *arg = (worker_arg *)argp;
    cpu_set_t set;
    CPU_ZERO(&set);
    CPU_SET(arg->cpu, &set);
    pthread_setaffinity_np(pthread_self(), sizeof(set), &set);

    double *a = malloc(ELEMS * sizeof(double));
    double *b = malloc(ELEMS * sizeof(double));
    double *c = malloc(ELEMS * sizeof(double));
    if (!a || !b || !c) { fprintf(stderr, "alloc failed\n"); exit(2); }
    for (long i = 0; i < ELEMS; i++) { a[i] = 0.0; b[i] = 1.5; c[i] = 2.5; }
    const double s = 3.0;
    /* warmup: 2 untimed passes (page faults, TLB, frequency ramp) */
    for (int r = 0; r < 2; r++)
        for (long i = 0; i < ELEMS; i++) a[i] = b[i] + s * c[i];

    pthread_barrier_wait(&barrier);
    for (long r = 0; r < REPS; r++)
        for (long i = 0; i < ELEMS; i++) a[i] = b[i] + s * c[i];
    /* keep the compiler from dead-coding the loop */
    arg->checksum = a[0] + a[ELEMS - 1];
    free(a); free(b); free(c);
    return NULL;
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s nthreads [elems] [reps]\n", argv[0]); return 1; }
    int n = atoi(argv[1]);
    if (argc > 2) ELEMS = atol(argv[2]);
    if (argc > 3) REPS = atol(argv[3]);

    pthread_barrier_init(&barrier, NULL, n + 1);
    pthread_t tids[256];
    worker_arg args[256];
    for (int i = 0; i < n; i++) {
        args[i].cpu = i;
        pthread_create(&tids[i], NULL, worker, &args[i]);
    }
    pthread_barrier_wait(&barrier); /* all warmed up and pinned */
    double t0 = now_sec();
    for (int i = 0; i < n; i++) pthread_join(tids[i], NULL);
    double dt = now_sec() - t0;

    double bytes = (double)n * REPS * ELEMS * 24.0;
    double check = 0.0;
    for (int i = 0; i < n; i++) check += args[i].checksum;
    printf("{\"threads\": %d, \"elems\": %ld, \"reps\": %ld, \"sec\": %.4f, "
           "\"gbps\": %.3f, \"check\": %.1f}\n",
           n, ELEMS, REPS, dt, bytes / dt / 1e9, check);
    return 0;
}

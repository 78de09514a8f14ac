/* pjrt_runner — serve an exported FDGAN artifact from C, no Python.
 *
 * The TPU-native deployment endgame: the reference framework always drags
 * a Python interpreter + torch along to serve (demo.py rebuilds the
 * nn.Module graph to load a .pth). Here the serving runtime is ~600 lines
 * of C against the PJRT C API: dlopen a PJRT plugin, compile the StableHLO
 * bytecode produced by `fdgan_tpu.io.export.export_native_bundle`, and
 * run inference — weights baked into the program, zero Python anywhere in
 * the serving process.
 *
 * Bundle contract (written by export_native_bundle, see io/export.py):
 *   <base>.mlirbc  StableHLO portable bytecode (what JAX itself hands
 *                  PJRT_Client_Compile with format "mlir")
 *   <base>.copts   serialized xla.CompileOptionsProto
 *   <base>.sig     two text lines "<dtype> <d0> <d1> ..." (input, output)
 *
 * Usage:
 *   pjrt_runner <bundle_base> [--plugin SO] [--input RAW] [--output RAW]
 *               [--loops N] [--serve PORT] [--host ADDR]
 *
 * --serve PORT turns the binary into a zero-Python serving daemon: a
 * minimal HTTP/1.1 endpoint where POST /dehaze takes the bundle's exact
 * raw input bytes (uint8 HWC — decode images at the edge; there is
 * deliberately no codec in this process) and answers with the raw output
 * bytes, headers matching the Python server's ?raw=1 contract
 * (X-Image-Shape / X-Image-Dtype, serve_http.py:252-270). GET /healthz
 * reports readiness. Binds 127.0.0.1 unless --host says otherwise; slow
 * clients are bounded by 30 s socket timeouts. Single-threaded with a
 * one-deep pipeline: while request N executes on the chip, request N+1's
 * socket read and host->device upload proceed (both ride the tunnel, the
 * slow resource here); responses stay FIFO.
 *
 * POST /reload (body: plain-text bundle base path; empty body = the
 * startup bundle) hot-swaps weights with zero downtime — the C twin of
 * the Python engine's InferenceEngine.reload (serve.py). Weights are
 * baked into the exported program, so "reload" here means compiling the
 * NEW bundle on a background thread while the current executable keeps
 * serving; the swap happens at a quiescent point (no in-flight execute)
 * before the next request. The new bundle's .sig must match the serving
 * signature exactly (409 otherwise); one reload in flight at a time
 * (409); a failed compile keeps the old weights serving and surfaces the
 * error in GET /stats. /healthz and /stats report weights_version.
 *
 * Defaults target this machine's axon TPU plugin; --plugin lets the same
 * binary drive any PJRT plugin (CPU, GPU, stock libtpu) with a matching
 * bundle. Works against PJRT C API >= 0.54 via the append-only forward-
 * compatibility contract (we only touch pre-0.54 entry points and pass
 * modern struct_size values, which plugins accept as >= their own).
 */

#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <unistd.h>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <poll.h>
#include <pthread.h>
#include <signal.h>
#include <strings.h>
#include <sys/socket.h>
#include <sys/time.h>

#include "xla/pjrt/c/pjrt_c_api.h"

#define DEFAULT_PLUGIN "/opt/axon/libaxon_pjrt.so"

static const PJRT_Api* g_api = NULL;

static double now_s(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

static void die(const char* msg) {
  fprintf(stderr, "pjrt_runner: %s\n", msg);
  exit(1);
}

/* Print the plugin's error message and exit (PJRT errors own their text). */
static void check(PJRT_Error* err, const char* what) {
  if (err == NULL) return;
  PJRT_Error_Message_Args m;
  memset(&m, 0, sizeof m);
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  fprintf(stderr, "pjrt_runner: %s failed: %.*s\n", what, (int)m.message_size,
          m.message);
  PJRT_Error_Destroy_Args d;
  memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  exit(1);
}

/* Non-fatal variant of check(): capture the plugin's error text into buf
 * and return -1 (the reload path must not exit the serving process). */
static int err_text(PJRT_Error* err, const char* what, char* buf, size_t cap) {
  if (err == NULL) return 0;
  PJRT_Error_Message_Args m;
  memset(&m, 0, sizeof m);
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  snprintf(buf, cap, "%s failed: %.*s", what, (int)m.message_size, m.message);
  PJRT_Error_Destroy_Args d;
  memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  return -1;
}

static void await_event(PJRT_Event* ev, const char* what) {
  PJRT_Event_Await_Args a;
  memset(&a, 0, sizeof a);
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = ev;
  check(g_api->PJRT_Event_Await(&a), what);
  PJRT_Event_Destroy_Args d;
  memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  g_api->PJRT_Event_Destroy(&d);
}

/* Returns NULL on any failure (reload must not kill the serving process). */
static char* read_file_opt(const char* path, size_t* size_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return NULL;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = (char*)malloc((size_t)n);
  if (!buf || fread(buf, 1, (size_t)n, f) != (size_t)n) {
    free(buf);
    fclose(f);
    return NULL;
  }
  fclose(f);
  *size_out = (size_t)n;
  return buf;
}

static char* read_file(const char* path, size_t* size_out) {
  char* buf = read_file_opt(path, size_out);
  if (!buf) {
    fprintf(stderr, "pjrt_runner: cannot read %s\n", path);
    exit(1);
  }
  return buf;
}

/* One ".sig" line: "<u8|f32> <d0> <d1> ..." */
typedef struct {
  PJRT_Buffer_Type type;
  size_t elem_bytes;
  int64_t dims[8];
  size_t num_dims;
  size_t total_bytes;
} Signature;

static int parse_sig_line(FILE* f, Signature* s) {
  char dtype[16];
  if (fscanf(f, "%15s", dtype) != 1) return -1;
  if (strcmp(dtype, "u8") == 0) {
    s->type = PJRT_Buffer_Type_U8;
    s->elem_bytes = 1;
  } else if (strcmp(dtype, "f32") == 0) {
    s->type = PJRT_Buffer_Type_F32;
    s->elem_bytes = 4;
  } else {
    return -1; /* unsupported dtype (u8|f32) */
  }
  s->num_dims = 0;
  s->total_bytes = s->elem_bytes;
  long long d;
  while (s->num_dims < 8 && fscanf(f, "%lld", &d) == 1) {
    s->dims[s->num_dims++] = (int64_t)d;
    s->total_bytes *= (size_t)d;
    int c = fgetc(f);
    if (c == '\n' || c == EOF) break;
    ungetc(c, f);
  }
  return s->num_dims == 0 ? -1 : 0;
}

/* Read "<base>.sig" (two lines: input, output). 0 on success. */
static int load_sig(const char* base, Signature* in_sig, Signature* out_sig) {
  char path[1024];
  snprintf(path, sizeof path, "%s.sig", base);
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  int rc = parse_sig_line(f, in_sig) || parse_sig_line(f, out_sig);
  fclose(f);
  return rc ? -1 : 0;
}

static int sig_equal(const Signature* a, const Signature* b) {
  if (a->type != b->type || a->num_dims != b->num_dims) return 0;
  for (size_t i = 0; i < a->num_dims; i++)
    if (a->dims[i] != b->dims[i]) return 0;
  return 1;
}

/* The axon plugin handshake: the same env contract the Python
 * sitecustomize establishes (axon/register) — setenv-if-absent so an
 * already-configured environment wins. Harmless for other plugins. */
static void default_env(void) {
  setenv("TPU_SKIP_MDS_QUERY", "1", 0);
  setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
  setenv("AXON_COMPAT_VERSION", "49", 0);
  setenv("TPU_ACCELERATOR_TYPE", "v5litepod-4", 0);
  setenv("TPU_TOPOLOGY", "1x1", 0);
  /* zero-egress tunnel relay: the pre-existing terminal is reached via
   * loopback (what the Python sitecustomize sets up from
   * PALLAS_AXON_POOL_IPS) */
  if (getenv("PALLAS_AXON_POOL_IPS") != NULL) {
    setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);
    setenv("AXON_LOOPBACK_RELAY", "1", 0);
  }
}

static PJRT_NamedValue named_str(const char* name, const char* val) {
  PJRT_NamedValue v;
  memset(&v, 0, sizeof v);
  v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
  v.name = name;
  v.name_size = strlen(name);
  v.type = PJRT_NamedValue_kString;
  v.string_value = val;
  v.value_size = strlen(val);
  return v;
}

/* ---- one inference: upload, execute, fetch (dense row-major) ---------- */

static PJRT_Client* g_client = NULL;
static PJRT_Device* g_device = NULL;
static PJRT_LoadedExecutable* g_exec = NULL;
static Signature g_in_sig, g_out_sig;

/* Compile "<base>.mlirbc" with "<base>.copts" on g_client. Non-fatal:
 * returns 0 and *out on success, -1 with the reason in errbuf otherwise
 * (the reload thread runs this while the daemon keeps serving). */
static int compile_bundle(const char* base, PJRT_LoadedExecutable** out,
                          char* errbuf, size_t errcap) {
  char path[1024];
  size_t mlir_size = 0, copts_size = 0;
  snprintf(path, sizeof path, "%s.mlirbc", base);
  char* mlir = read_file_opt(path, &mlir_size);
  snprintf(path, sizeof path, "%s.copts", base);
  char* copts = read_file_opt(path, &copts_size);
  if (!mlir || !copts) {
    snprintf(errbuf, errcap, "cannot read %s.{mlirbc,copts}", base);
    free(mlir);
    free(copts);
    return -1;
  }

  PJRT_Program prog;
  memset(&prog, 0, sizeof prog);
  prog.struct_size = PJRT_Program_STRUCT_SIZE;
  prog.code = mlir;
  prog.code_size = mlir_size;
  prog.format = "mlir";
  prog.format_size = 4;

  PJRT_Client_Compile_Args comp;
  memset(&comp, 0, sizeof comp);
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = g_client;
  comp.program = &prog;
  comp.compile_options = copts;
  comp.compile_options_size = copts_size;
  int rc = err_text(g_api->PJRT_Client_Compile(&comp), "PJRT_Client_Compile",
                    errbuf, errcap);
  free(mlir);
  free(copts);
  if (rc) return -1;
  *out = comp.executable;
  return 0;
}

/* ---- zero-downtime weight hot-reload (the C twin of serve.py reload) --- */

enum { RELOAD_IDLE = 0, RELOAD_COMPILING = 1, RELOAD_READY = 2 };

static pthread_mutex_t g_reload_mu = PTHREAD_MUTEX_INITIALIZER;
static int g_reload_state = RELOAD_IDLE;
static PJRT_LoadedExecutable* g_reload_exec = NULL;
static char g_reload_base[1024];       /* bundle being compiled / pending */
static char g_reload_err[512];         /* last failed reload, "" if none */
static char g_bundle_cur[1024];        /* currently-serving bundle base */
static long g_weights_version = 0;     /* bumped on every successful swap */

static void* reload_thread(void* arg) {
  (void)arg;
  PJRT_LoadedExecutable* ne = NULL;
  char err[512];
  double t0 = now_s();
  if (compile_bundle(g_reload_base, &ne, err, sizeof err) != 0) {
    pthread_mutex_lock(&g_reload_mu);
    snprintf(g_reload_err, sizeof g_reload_err, "%s", err);
    g_reload_state = RELOAD_IDLE;
    pthread_mutex_unlock(&g_reload_mu);
    fprintf(stderr, "pjrt_runner: reload failed: %s\n", err);
  } else {
    pthread_mutex_lock(&g_reload_mu);
    g_reload_exec = ne;
    g_reload_state = RELOAD_READY;
    pthread_mutex_unlock(&g_reload_mu);
    printf("reload: compiled %s in %.1fs (swap pending)\n", g_reload_base,
           now_s() - t0);
    fflush(stdout);
  }
  return NULL;
}

/* Swap in a compiled reload. MUST be called with no inference in flight —
 * destroying the old executable during an execute is undefined. */
static void maybe_swap_exec(void) {
  pthread_mutex_lock(&g_reload_mu);
  if (g_reload_state != RELOAD_READY) {
    pthread_mutex_unlock(&g_reload_mu);
    return;
  }
  PJRT_LoadedExecutable* old = g_exec;
  g_exec = g_reload_exec;
  g_reload_exec = NULL;
  g_reload_state = RELOAD_IDLE;
  g_reload_err[0] = 0;
  g_weights_version++;
  snprintf(g_bundle_cur, sizeof g_bundle_cur, "%s", g_reload_base);
  long ver = g_weights_version;
  pthread_mutex_unlock(&g_reload_mu);
  if (g_api->PJRT_LoadedExecutable_Destroy != NULL) {
    PJRT_LoadedExecutable_Destroy_Args ed;
    memset(&ed, 0, sizeof ed);
    ed.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    ed.executable = old;
    check(g_api->PJRT_LoadedExecutable_Destroy(&ed),
          "PJRT_LoadedExecutable_Destroy(old)");
  }
  printf("reload: serving %s (weights_version %ld)\n", g_bundle_cur, ver);
  fflush(stdout);
}

/* An inference split in two so the serving loop can overlap the NEXT
 * request's socket read + host->device upload with the current execute
 * (PJRT executes asynchronously; device_complete_events is the handle). */
typedef struct {
  PJRT_Buffer* inbuf;
  PJRT_Buffer* outbuf;
  PJRT_Event* done;
  double t_start;
} Inflight;

static Inflight launch_once(const char* input) {
  Inflight fl;
  fl.t_start = now_s();

  PJRT_Client_BufferFromHostBuffer_Args hb;
  memset(&hb, 0, sizeof hb);
  hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  hb.client = g_client;
  hb.data = input;
  hb.type = g_in_sig.type;
  hb.dims = g_in_sig.dims;
  hb.num_dims = g_in_sig.num_dims;
  hb.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  hb.device = g_device;
  check(g_api->PJRT_Client_BufferFromHostBuffer(&hb),
        "PJRT_Client_BufferFromHostBuffer");
  await_event(hb.done_with_host_buffer, "host->device transfer");
  PJRT_Buffer* inbuf = hb.buffer;

  PJRT_ExecuteOptions eo;
  memset(&eo, 0, sizeof eo);
  eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* args_dev0[1] = {inbuf};
  PJRT_Buffer* const* arg_lists[1] = {args_dev0};
  PJRT_Buffer* out_dev0[1] = {NULL};
  PJRT_Buffer** out_lists[1] = {out_dev0};
  PJRT_Event* done[1] = {NULL};

  PJRT_LoadedExecutable_Execute_Args ex;
  memset(&ex, 0, sizeof ex);
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = g_exec;
  ex.options = &eo;
  ex.argument_lists = arg_lists;
  ex.num_devices = 1;
  ex.num_args = 1;
  ex.output_lists = out_lists;
  ex.device_complete_events = done;
  check(g_api->PJRT_LoadedExecutable_Execute(&ex),
        "PJRT_LoadedExecutable_Execute");
  fl.inbuf = inbuf;
  fl.outbuf = out_dev0[0];
  fl.done = done[0];
  return fl;
}

static double finish_once(Inflight* fl, char* result) {
  await_event(fl->done, "device execution");

  /* Demand dense row-major bytes. With host_layout NULL the copy comes
   * back in the DEVICE buffer's layout — on TPU that reorders the minor
   * dims of a (1,H,W,3) u8 tensor, which scrambles channels in the flat
   * bytes (measured: a clean 3-cycle channel permutation vs the Python
   * runner until this was set). The plugin accepts only Tiled layouts
   * here (what jaxlib's ToLiteral passes): dense row-major is
   * minor_to_major = [N-1, ..., 0] with no tiles. */
  int64_t minor_to_major[8];
  for (size_t d = 0; d < g_out_sig.num_dims; d++)
    minor_to_major[d] = (int64_t)(g_out_sig.num_dims - 1 - d);
  PJRT_Buffer_MemoryLayout host_layout;
  memset(&host_layout, 0, sizeof host_layout);
  host_layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
  host_layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
  host_layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
  host_layout.tiled.minor_to_major = minor_to_major;
  host_layout.tiled.minor_to_major_size = g_out_sig.num_dims;

  PJRT_Buffer_ToHostBuffer_Args th;
  memset(&th, 0, sizeof th);
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = fl->outbuf;
  th.host_layout = &host_layout;
  th.dst = result;
  th.dst_size = g_out_sig.total_bytes;
  check(g_api->PJRT_Buffer_ToHostBuffer(&th), "PJRT_Buffer_ToHostBuffer");
  await_event(th.event, "device->host transfer");

  PJRT_Buffer_Destroy_Args bd;
  memset(&bd, 0, sizeof bd);
  bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  bd.buffer = fl->outbuf;
  check(g_api->PJRT_Buffer_Destroy(&bd), "PJRT_Buffer_Destroy(out)");
  bd.buffer = fl->inbuf;
  check(g_api->PJRT_Buffer_Destroy(&bd), "PJRT_Buffer_Destroy(in)");

  return now_s() - fl->t_start;
}

static double run_once(const char* input, char* result) {
  Inflight fl = launch_once(input);
  return finish_once(&fl, result);
}

static PJRT_NamedValue named_int(const char* name, int64_t val) {
  PJRT_NamedValue v;
  memset(&v, 0, sizeof v);
  v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
  v.name = name;
  v.name_size = strlen(name);
  v.type = PJRT_NamedValue_kInt64;
  v.int64_value = val;
  v.value_size = 1;
  return v;
}

/* ---- zero-Python HTTP serving ------------------------------------------
 * Deliberately minimal: HTTP/1.1, Connection: close, single-threaded
 * (requests serialize at the one chip regardless). Raw-bytes protocol —
 * the same payloads the Python server's ?raw=1 mode ships
 * (serve_http.py:252-270); image codecs live at the edge, not here. */

/* Total wall-clock budget for reading ONE request. The per-read
 * SO_RCVTIMEO alone doesn't bound a trickling client (1 byte per 25 s
 * resets it forever) — and with the one-deep pipeline a stalled read
 * holds ANOTHER client's already-computed response hostage. */
#define REQUEST_READ_DEADLINE_S 60.0

static int read_http_head(int fd, char* buf, size_t cap, size_t* head_len,
                          size_t* body_got, double deadline) {
  size_t n = 0;
  while (n < cap - 1) {
    ssize_t r = read(fd, buf + n, cap - 1 - n);
    if (r <= 0 || now_s() > deadline) return -1;
    n += (size_t)r;
    buf[n] = 0;
    char* end = strstr(buf, "\r\n\r\n");
    if (end) {
      *head_len = (size_t)(end - buf) + 4;
      *body_got = n - *head_len;
      return 0;
    }
  }
  return -1;
}

static void http_reply(int fd, int code, const char* status,
                       const char* ctype, const char* extra,
                       const char* body, size_t body_len) {
  char head[512];
  int m = snprintf(head, sizeof head,
                   "HTTP/1.1 %d %s\r\nContent-Type: %s\r\n"
                   "Content-Length: %zu\r\nConnection: close\r\n%s\r\n",
                   code, status, ctype, body_len, extra ? extra : "");
  if (write(fd, head, (size_t)m) < 0) return;
  size_t off = 0;
  while (off < body_len) {
    ssize_t w = write(fd, body + off, body_len - off);
    if (w <= 0) return;
    off += (size_t)w;
  }
}

static long g_served = 0;
static double g_total_s = 0.0, g_last_s = 0.0, g_start_s = 0.0;

static void complete_request(Inflight* fl, int fd, char* out,
                             const char* shape_hdr) {
  double dt = finish_once(fl, out);
  g_served++;
  g_total_s += dt;
  g_last_s = dt;
  http_reply(fd, 200, "OK", "application/octet-stream", shape_hdr, out,
             g_out_sig.total_bytes);
  close(fd);
  if (g_served % 16 == 1)
    printf("served %ld (last inference %.3fs)\n", g_served, dt),
        fflush(stdout);
}

/* GET /stats — the C twin of the Python server's endpoint (same shape of
 * payload, fewer fields: no batching ladder in this daemon). */
static void reply_stats(int fd) {
  char body[2048];
  pthread_mutex_lock(&g_reload_mu);
  int reloading = g_reload_state != RELOAD_IDLE;
  long ver = g_weights_version;
  char rerr[512], cur[1024];
  snprintf(rerr, sizeof rerr, "%s", g_reload_err);
  snprintf(cur, sizeof cur, "%s", g_bundle_cur);
  pthread_mutex_unlock(&g_reload_mu);
  int m = snprintf(body, sizeof body,
                   "{\"served\": %ld, \"last_inference_s\": %.4f, "
                   "\"mean_inference_s\": %.4f, \"uptime_s\": %.1f, "
                   "\"weights_version\": %ld, \"reloading\": %s, "
                   "\"bundle\": \"%s\", \"last_reload_error\": \"%s\"}",
                   g_served, g_last_s,
                   g_served > 0 ? g_total_s / (double)g_served : 0.0,
                   now_s() - g_start_s, ver, reloading ? "true" : "false",
                   cur, rerr);
  http_reply(fd, 200, "OK", "application/json", NULL, body, (size_t)m);
}

/* POST /reload — body is a plain-text bundle base path (empty = the
 * startup bundle). Validates the .sig, then compiles on a background
 * thread; 202 means "compiling, swap when ready". */
static void handle_reload(int fd, const char* body_txt, size_t body_len) {
  char base[1024];
  size_t n = body_len < sizeof base - 1 ? body_len : sizeof base - 1;
  memcpy(base, body_txt, n);
  base[n] = 0;
  /* trim whitespace/newlines */
  while (n > 0 && (base[n - 1] == '\n' || base[n - 1] == '\r' ||
                   base[n - 1] == ' ' || base[n - 1] == '\t'))
    base[--n] = 0;
  char* start = base;
  while (*start == ' ' || *start == '\t') start++;

  pthread_mutex_lock(&g_reload_mu);
  if (g_reload_state != RELOAD_IDLE) {
    pthread_mutex_unlock(&g_reload_mu);
    const char err[] = "{\"error\": \"reload already in progress\"}";
    http_reply(fd, 409, "Conflict", "application/json", NULL, err,
               sizeof err - 1);
    return;
  }
  if (*start == 0) start = g_bundle_cur; /* empty body: re-load current */
  snprintf(g_reload_base, sizeof g_reload_base, "%s", start);
  pthread_mutex_unlock(&g_reload_mu);

  Signature nin, nout;
  if (load_sig(g_reload_base, &nin, &nout) != 0) {
    char err[1200];
    int m = snprintf(err, sizeof err,
                     "{\"error\": \"cannot read %s.sig\"}", g_reload_base);
    http_reply(fd, 400, "Bad Request", "application/json", NULL, err,
               (size_t)m);
    return;
  }
  if (!sig_equal(&nin, &g_in_sig) || !sig_equal(&nout, &g_out_sig)) {
    const char err[] =
        "{\"error\": \"bundle signature mismatch: reload requires the same "
        "input/output shapes and dtypes as the serving bundle\"}";
    http_reply(fd, 409, "Conflict", "application/json", NULL, err,
               sizeof err - 1);
    return;
  }

  pthread_mutex_lock(&g_reload_mu);
  g_reload_state = RELOAD_COMPILING;
  g_reload_err[0] = 0;
  pthread_mutex_unlock(&g_reload_mu);
  pthread_t th;
  if (pthread_create(&th, NULL, reload_thread, NULL) != 0) {
    pthread_mutex_lock(&g_reload_mu);
    g_reload_state = RELOAD_IDLE;
    snprintf(g_reload_err, sizeof g_reload_err, "pthread_create failed");
    pthread_mutex_unlock(&g_reload_mu);
    const char err[] = "{\"error\": \"cannot start reload thread\"}";
    http_reply(fd, 500, "Internal Server Error", "application/json", NULL,
               err, sizeof err - 1);
    return;
  }
  pthread_detach(th);
  char ok[1200];
  int m = snprintf(ok, sizeof ok,
                   "{\"status\": \"compiling\", \"bundle\": \"%s\", "
                   "\"weights_version\": %ld}",
                   g_reload_base, g_weights_version);
  http_reply(fd, 202, "Accepted", "application/json", NULL, ok, (size_t)m);
}

static int serve_http(int port, const char* host) {
  char* body = (char*)malloc(g_in_sig.total_bytes);
  char* out = (char*)malloc(g_out_sig.total_bytes);

  /* absorb the slow first dispatch before accepting traffic */
  for (size_t i = 0; i < g_in_sig.total_bytes; i++)
    body[i] = (char)((i * 131u) % 251u);
  double warm = run_once(body, out);
  printf("warmup dispatch %.3fs\n", warm);

  signal(SIGPIPE, SIG_IGN);
  int srv = socket(AF_INET, SOCK_STREAM, 0);
  if (srv < 0) die("socket");
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
  struct sockaddr_in addr;
  memset(&addr, 0, sizeof addr);
  addr.sin_family = AF_INET;
  /* loopback by default (matches the Python server); --host 0.0.0.0 to
   * expose — an inference daemon must not listen on all interfaces
   * unless asked to */
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) die("bad --host");
  addr.sin_port = htons((uint16_t)port);
  if (bind(srv, (struct sockaddr*)&addr, sizeof addr) < 0) die("bind");
  if (listen(srv, 16) < 0) die("listen");

  char shape_hdr[160];
  {
    char dims[96] = "";
    size_t off = 0;
    /* per-image shape (drop the leading batch-1 dim), matching the Python
     * server's X-Image-Shape */
    for (size_t d = 1; d < g_out_sig.num_dims; d++)
      off += (size_t)snprintf(dims + off, sizeof dims - off, "%s%lld",
                              d > 1 ? "x" : "",
                              (long long)g_out_sig.dims[d]);
    snprintf(shape_hdr, sizeof shape_hdr,
             "X-Image-Shape: %s\r\nX-Image-Dtype: %s\r\n", dims,
             g_out_sig.type == PJRT_Buffer_Type_U8 ? "uint8" : "float32");
  }
  g_start_s = now_s();
  printf("serving on %s:%d (POST /dehaze expects exactly %zu raw bytes)\n",
         host, port, g_in_sig.total_bytes);
  fflush(stdout);

  char head[8192];
  /* One-deep pipeline: while request N executes on the device, the loop
   * accepts + reads + uploads request N+1 (socket I/O and the host->device
   * transfer ride the tunnel while the chip computes). The in-flight
   * request is completed either when the next one has been launched or
   * when poll() says no client is waiting. Responses stay FIFO. */
  int pend_fd = -1;
  Inflight pend_fl;
  for (;;) {
    if (pend_fd >= 0) {
      struct pollfd pw;
      pw.fd = srv;
      pw.events = POLLIN;
      pw.revents = 0;
      if (poll(&pw, 1, 0) <= 0) { /* nobody waiting: finish in-flight now */
        complete_request(&pend_fl, pend_fd, out, shape_hdr);
        pend_fd = -1;
        continue;
      }
    }
    int fd = accept(srv, NULL, NULL);
    if (fd < 0) continue;
    /* a stalled or malicious client must not wedge the single-threaded
     * loop forever (ADVICE r4): bound both directions */
    struct timeval tmo;
    tmo.tv_sec = 30;
    tmo.tv_usec = 0;
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tmo, sizeof tmo);
    setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tmo, sizeof tmo);
    double read_deadline = now_s() + REQUEST_READ_DEADLINE_S;
    size_t head_len = 0, body_got = 0;
    if (read_http_head(fd, head, sizeof head, &head_len, &body_got,
                       read_deadline) != 0) {
      close(fd);
      continue;
    }
    /* Apply a finished reload at a quiescent point: drain any in-flight
     * inference (it ran on the OLD weights — FIFO is preserved), then
     * swap executables before handling this request. */
    pthread_mutex_lock(&g_reload_mu);
    int swap_ready = g_reload_state == RELOAD_READY;
    pthread_mutex_unlock(&g_reload_mu);
    if (swap_ready) {
      if (pend_fd >= 0) {
        complete_request(&pend_fl, pend_fd, out, shape_hdr);
        pend_fd = -1;
      }
      maybe_swap_exec();
    }
    if (strncmp(head, "GET /healthz", 12) == 0) {
      char hb[128];
      pthread_mutex_lock(&g_reload_mu);
      long ver = g_weights_version;
      int reloading = g_reload_state != RELOAD_IDLE;
      pthread_mutex_unlock(&g_reload_mu);
      int m = snprintf(hb, sizeof hb,
                       "{\"ok\": true, \"weights_version\": %ld, "
                       "\"reloading\": %s}",
                       ver, reloading ? "true" : "false");
      http_reply(fd, 200, "OK", "application/json", NULL, hb, (size_t)m);
      close(fd);
      continue;
    }
    if (strncmp(head, "GET /stats", 10) == 0) {
      reply_stats(fd);
      close(fd);
      continue;
    }
    if (strncmp(head, "POST /reload", 12) == 0) {
      long rlen = 0;
      for (char* p = head; (p = strstr(p, "\r\n")) != NULL && p[2];) {
        p += 2;
        if (strncasecmp(p, "Content-Length:", 15) == 0)
          rlen = strtol(p + 15, NULL, 10);
      }
      if (rlen < 0 || rlen > 4000) {
        const char err[] = "{\"error\": \"reload body too large\"}";
        http_reply(fd, 400, "Bad Request", "application/json", NULL, err,
                   sizeof err - 1);
        close(fd);
        continue;
      }
      char rbody[4096];
      size_t got = body_got < (size_t)rlen ? body_got : (size_t)rlen;
      memcpy(rbody, head + head_len, got);
      while (got < (size_t)rlen) {
        ssize_t r = read(fd, rbody + got, (size_t)rlen - got);
        if (r <= 0 || now_s() > read_deadline) break;
        got += (size_t)r;
      }
      handle_reload(fd, rbody, got);
      close(fd);
      continue;
    }
    if (strncmp(head, "POST /dehaze", 12) != 0) {
      const char err[] = "{\"error\": \"unknown path\"}";
      http_reply(fd, 404, "Not Found", "application/json", NULL, err,
                 sizeof err - 1);
      close(fd);
      continue;
    }
    long clen = -1;
    int expect_continue = 0;
    for (char* p = head; (p = strstr(p, "\r\n")) != NULL && p[2];) {
      p += 2;
      if (strncasecmp(p, "Content-Length:", 15) == 0)
        clen = strtol(p + 15, NULL, 10);
      else if (strncasecmp(p, "Expect:", 7) == 0 &&
               strstr(p, "100-continue") != NULL)
        expect_continue = 1;
    }
    if (clen != (long)g_in_sig.total_bytes) {
      char err[160];
      int m = snprintf(err, sizeof err,
                       "{\"error\": \"body must be exactly %zu raw bytes "
                       "(got %ld)\"}",
                       g_in_sig.total_bytes, clen);
      int too_big = clen > (long)g_in_sig.total_bytes;
      http_reply(fd, too_big ? 413 : 400,
                 too_big ? "Content Too Large" : "Bad Request",
                 "application/json", NULL, err, (size_t)m);
      close(fd);
      continue;
    }
    if (expect_continue && body_got == 0) {
      /* curl et al. hold the body until told to proceed */
      const char cont[] = "HTTP/1.1 100 Continue\r\n\r\n";
      if (write(fd, cont, sizeof cont - 1) < 0) {
        close(fd);
        continue;
      }
    }
    if (body_got > g_in_sig.total_bytes) body_got = g_in_sig.total_bytes;
    memcpy(body, head + head_len, body_got);
    while (body_got < g_in_sig.total_bytes) {
      ssize_t r = read(fd, body + body_got, g_in_sig.total_bytes - body_got);
      if (r <= 0 || now_s() > read_deadline) break;
      body_got += (size_t)r;
    }
    if (body_got < g_in_sig.total_bytes) {
      close(fd);
      continue;
    }
    /* launch_once awaits the host->device transfer before returning, so
     * `body` is reusable for the next request while this one executes */
    Inflight fl = launch_once(body);
    if (pend_fd >= 0) {
      complete_request(&pend_fl, pend_fd, out, shape_hdr);
    }
    pend_fl = fl;
    pend_fd = fd;
  }
  return 0; /* unreachable */
}

int main(int argc, char** argv) {
  const char* base = NULL;
  const char* plugin = DEFAULT_PLUGIN;
  const char* input_path = NULL;
  const char* output_path = NULL;
  const char* serve_host = "127.0.0.1";
  int loops = 1;
  int serve_port = 0;
  for (int i = 1; i < argc; i++) {
    if (strcmp(argv[i], "--plugin") == 0 && i + 1 < argc)
      plugin = argv[++i];
    else if (strcmp(argv[i], "--input") == 0 && i + 1 < argc)
      input_path = argv[++i];
    else if (strcmp(argv[i], "--output") == 0 && i + 1 < argc)
      output_path = argv[++i];
    else if (strcmp(argv[i], "--loops") == 0 && i + 1 < argc)
      loops = atoi(argv[++i]);
    else if (strcmp(argv[i], "--serve") == 0 && i + 1 < argc)
      serve_port = atoi(argv[++i]);
    else if (strcmp(argv[i], "--host") == 0 && i + 1 < argc)
      serve_host = argv[++i];
    else if (argv[i][0] != '-' && base == NULL)
      base = argv[i];
    else {
      fprintf(stderr,
              "usage: %s <bundle_base> [--plugin SO] [--input RAW] "
              "[--output RAW] [--loops N] [--serve PORT] [--host ADDR]\n",
              argv[0]);
      return 2;
    }
  }
  if (!base) die("missing <bundle_base> (from export_native_bundle)");

  char path[1024];
  size_t mlir_size;
  snprintf(path, sizeof path, "%s.mlirbc", base);
  char* mlir_probe = read_file(path, &mlir_size); /* existence + size */
  free(mlir_probe);
  Signature in_sig, out_sig;
  if (load_sig(base, &in_sig, &out_sig) != 0) die("bad or missing .sig");
  printf("bundle %s: program %.1f MB, input %zu B, output %zu B\n", base,
         mlir_size / 1e6, in_sig.total_bytes, out_sig.total_bytes);

  /* ---- plugin + client ------------------------------------------------ */
  default_env();
  void* handle = dlopen(plugin, RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    fprintf(stderr, "pjrt_runner: dlopen(%s): %s\n", plugin, dlerror());
    return 1;
  }
  const PJRT_Api* (*get_api)(void) =
      (const PJRT_Api* (*)(void))dlsym(handle, "GetPjrtApi");
  if (!get_api) die("plugin has no GetPjrtApi");
  g_api = get_api();
  printf("plugin %s: PJRT C API %d.%d\n", plugin,
         g_api->pjrt_api_version.major_version,
         g_api->pjrt_api_version.minor_version);

  char session_id[64];
  snprintf(session_id, sizeof session_id, "pjrt-runner-%d-%ld", (int)getpid(),
           (long)time(NULL));
  PJRT_NamedValue opts[8];
  size_t nopts = 0;
  /* Mirrors axon/register/pjrt.py::_register_backend for the pool+
   * remote-compile path; other plugins ignore unknown options or reject
   * them — pass --plugin with a matching option-free build if so. */
  if (strstr(plugin, "axon") != NULL) {
    opts[nopts++] = named_int("remote_compile", 1);
    opts[nopts++] = named_int("local_only", 0);
    opts[nopts++] = named_int("priority", 0);
    opts[nopts++] = named_str("topology", "v5e:1x1x1");
    opts[nopts++] = named_int("n_slices", 1);
    opts[nopts++] = named_str("session_id", session_id);
    opts[nopts++] = named_int("rank", (int64_t)0xFFFFFFFF);
  }

  double t0 = now_s();
  PJRT_Client_Create_Args cc;
  memset(&cc, 0, sizeof cc);
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = opts;
  cc.num_options = nopts;
  check(g_api->PJRT_Client_Create(&cc), "PJRT_Client_Create");
  PJRT_Client* client = cc.client;
  printf("client up in %.1fs\n", now_s() - t0);

  PJRT_Client_AddressableDevices_Args ad;
  memset(&ad, 0, sizeof ad);
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  check(g_api->PJRT_Client_AddressableDevices(&ad),
        "PJRT_Client_AddressableDevices");
  if (ad.num_addressable_devices == 0) die("no addressable devices");
  PJRT_Device* device = ad.addressable_devices[0];
  printf("%zu addressable device(s)\n", ad.num_addressable_devices);

  /* ---- compile (same path the /reload thread uses) ---------------------- */
  g_client = client;
  t0 = now_s();
  PJRT_LoadedExecutable* exec = NULL;
  char cerr[512];
  if (compile_bundle(base, &exec, cerr, sizeof cerr) != 0) die(cerr);
  printf("compiled in %.1fs\n", now_s() - t0);

  PJRT_LoadedExecutable_GetExecutable_Args ge;
  memset(&ge, 0, sizeof ge);
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge),
        "PJRT_LoadedExecutable_GetExecutable");
  PJRT_Executable_NumOutputs_Args no;
  memset(&no, 0, sizeof no);
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  check(g_api->PJRT_Executable_NumOutputs(&no), "PJRT_Executable_NumOutputs");
  if (no.num_outputs != 1) die("expected exactly one program output");

  /* ---- input ----------------------------------------------------------- */
  char* input = (char*)malloc(in_sig.total_bytes);
  if (input_path) {
    size_t n;
    char* raw = read_file(input_path, &n);
    if (n != in_sig.total_bytes) {
      fprintf(stderr, "pjrt_runner: input is %zu B, signature needs %zu B\n",
              n, in_sig.total_bytes);
      return 1;
    }
    memcpy(input, raw, n);
    free(raw);
  } else {
    for (size_t i = 0; i < in_sig.total_bytes; i++)
      input[i] = (char)((i * 131u) % 251u); /* deterministic smoke pattern */
  }

  char* result = (char*)malloc(out_sig.total_bytes);
  g_device = device;
  g_exec = exec;
  g_in_sig = in_sig;
  g_out_sig = out_sig;
  snprintf(g_bundle_cur, sizeof g_bundle_cur, "%s", base);

  if (serve_port > 0) return serve_http(serve_port, serve_host);

  double best = 1e30, total = 0.0;
  for (int it = 0; it < loops; it++) {
    double dt = run_once(input, result);
    total += dt;
    if (dt < best) best = dt;
    uint64_t checksum = 0;
    for (size_t i = 0; i < out_sig.total_bytes; i++)
      checksum = checksum * 1099511628211ull + (uint8_t)result[i];
    printf("iter %d: %.3fs end-to-end (upload+exec+fetch), fnv %016llx\n", it,
           dt, (unsigned long long)checksum);
  }
  printf("loops=%d best=%.3fs mean=%.3fs\n", loops, best, total / loops);

  if (output_path) {
    FILE* f = fopen(output_path, "wb");
    if (!f || fwrite(result, 1, out_sig.total_bytes, f) != out_sig.total_bytes)
      die("cannot write output");
    fclose(f);
    printf("wrote %zu B to %s\n", out_sig.total_bytes, output_path);
  }

  PJRT_Client_Destroy_Args cd;
  memset(&cd, 0, sizeof cd);
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  check(g_api->PJRT_Client_Destroy(&cd), "PJRT_Client_Destroy");
  printf("ok\n");
  return 0;
}

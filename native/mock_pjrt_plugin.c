/* mock_pjrt_plugin — a hardware-free PJRT plugin for regression-testing
 * native/pjrt_runner.c in the ordinary test suite (no TPU, no XLA).
 *
 * This is NOT a compiler: PJRT_Client_Compile validates the program
 * container (format "mlir", non-empty bytecode) and returns an executable
 * whose "inference" is identity — the output device buffer is a byte-clone
 * of the input. An FDGAN uint8 bundle has identical input and output
 * signatures (batch,H,W,3 u8 → same), so the runner's full data path
 * (bundle parse → dlopen → client → compile → upload → execute → fetch →
 * HTTP daemon) round-trips bytes that the test can compare exactly.
 *
 * Contract checks baked in (each one a real regression the chip caught):
 * - PJRT_Buffer_ToHostBuffer must pass an explicit dense row-major Tiled
 *   host_layout (minor_to_major = [N-1..0], no tiles). A NULL host_layout
 *   returns device layout on TPU — channel-scrambled bytes
 *   (pjrt_runner.c:~235). The mock FAILS such calls so the suite pins it.
 * - struct_size values must be >= the pre-0.54 sizes the runner was
 *   written against (the append-only PJRT ABI rule).
 *
 * Build: make -C native mock_pjrt_plugin.so
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "xla/pjrt/c/pjrt_c_api.h"

/* ---- opaque object implementations ------------------------------------ */

struct PJRT_Error {
  char msg[256];
};

struct PJRT_Event {
  int dummy;
};

struct PJRT_Buffer {
  char* data;
  size_t size;
};

struct PJRT_Client {
  int dummy;
};

struct PJRT_Device {
  int dummy;
};

struct PJRT_LoadedExecutable {
  int dummy;
};

struct PJRT_Executable {
  int dummy;
};

static PJRT_Error* mk_error(const char* fmt, const char* detail) {
  PJRT_Error* e = (PJRT_Error*)calloc(1, sizeof(PJRT_Error));
  snprintf(e->msg, sizeof e->msg, fmt, detail ? detail : "");
  return e;
}

static void err_destroy(PJRT_Error_Destroy_Args* a) { free(a->error); }

static void err_message(PJRT_Error_Message_Args* a) {
  a->message = a->error->msg;
  a->message_size = strlen(a->error->msg);
}

static PJRT_Error* err_getcode(PJRT_Error_GetCode_Args* a) {
  a->code = PJRT_Error_Code_INTERNAL;
  return NULL;
}

/* ---- events: everything completes synchronously ----------------------- */

static PJRT_Event* mk_event(void) {
  return (PJRT_Event*)calloc(1, sizeof(PJRT_Event));
}

static PJRT_Error* event_await(PJRT_Event_Await_Args* a) {
  (void)a;
  return NULL;
}

static PJRT_Error* event_destroy(PJRT_Event_Destroy_Args* a) {
  free(a->event);
  return NULL;
}

/* ---- client / device --------------------------------------------------- */

static struct PJRT_Client g_client_obj;
static struct PJRT_Device g_device_obj;
static PJRT_Device* g_devices[1] = {&g_device_obj};
static struct PJRT_Executable g_exec_obj;

static PJRT_Error* client_create(PJRT_Client_Create_Args* a) {
  a->client = &g_client_obj;
  return NULL;
}

static PJRT_Error* client_destroy(PJRT_Client_Destroy_Args* a) {
  (void)a;
  return NULL;
}

static PJRT_Error* client_devices(PJRT_Client_AddressableDevices_Args* a) {
  a->addressable_devices = g_devices;
  a->num_addressable_devices = 1;
  return NULL;
}

static PJRT_Error* client_compile(PJRT_Client_Compile_Args* a) {
  if (a->program == NULL || a->program->code_size == 0)
    return mk_error("mock: empty program%s", NULL);
  if (a->program->format_size != 4 ||
      strncmp(a->program->format, "mlir", 4) != 0)
    return mk_error("mock: program format must be \"mlir\"%s", NULL);
  if (a->compile_options_size == 0)
    return mk_error("mock: missing serialized CompileOptionsProto%s", NULL);
  /* Fresh allocation per compile: the runner's hot-reload path destroys
   * the OLD executable after the swap — a double-destroy or a swap to a
   * stale pointer crashes here instead of only on real hardware. */
  a->executable =
      (PJRT_LoadedExecutable*)calloc(1, sizeof(PJRT_LoadedExecutable));
  return NULL;
}

static PJRT_Error* loaded_destroy(PJRT_LoadedExecutable_Destroy_Args* a) {
  free(a->executable);
  return NULL;
}

static PJRT_Error* get_executable(PJRT_LoadedExecutable_GetExecutable_Args* a) {
  a->executable = &g_exec_obj;
  return NULL;
}

static PJRT_Error* num_outputs(PJRT_Executable_NumOutputs_Args* a) {
  a->num_outputs = 1;
  return NULL;
}

/* ---- buffers ------------------------------------------------------------ */

static size_t elem_bytes(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_U8:
      return 1;
    case PJRT_Buffer_Type_F32:
      return 4;
    default:
      return 0;
  }
}

static PJRT_Error* from_host(PJRT_Client_BufferFromHostBuffer_Args* a) {
  size_t eb = elem_bytes(a->type);
  if (eb == 0) return mk_error("mock: unsupported buffer type%s", NULL);
  size_t n = eb;
  for (size_t i = 0; i < a->num_dims; i++) n *= (size_t)a->dims[i];
  PJRT_Buffer* b = (PJRT_Buffer*)calloc(1, sizeof(PJRT_Buffer));
  b->data = (char*)malloc(n);
  b->size = n;
  memcpy(b->data, a->data, n);
  a->buffer = b;
  a->done_with_host_buffer = mk_event();
  return NULL;
}

static PJRT_Error* buffer_destroy(PJRT_Buffer_Destroy_Args* a) {
  if (a->buffer) {
    free(a->buffer->data);
    free(a->buffer);
  }
  return NULL;
}

static PJRT_Error* execute(PJRT_LoadedExecutable_Execute_Args* a) {
  if (a->num_devices != 1 || a->num_args != 1)
    return mk_error("mock: expected 1 device / 1 argument%s", NULL);
  PJRT_Buffer* in = a->argument_lists[0][0];
  PJRT_Buffer* out = (PJRT_Buffer*)calloc(1, sizeof(PJRT_Buffer));
  out->data = (char*)malloc(in->size);
  out->size = in->size;
  memcpy(out->data, in->data, in->size); /* identity "inference" */
  a->output_lists[0][0] = out;
  if (a->device_complete_events != NULL)
    a->device_complete_events[0] = mk_event();
  return NULL;
}

static PJRT_Error* to_host(PJRT_Buffer_ToHostBuffer_Args* a) {
  /* Pin the layout contract: host_layout must be an explicit dense
   * row-major Tiled layout. NULL would silently hand back DEVICE layout on
   * TPU (channel-scrambled bytes) — fail loudly here so the suite catches
   * any regression to that. */
  if (a->host_layout == NULL)
    return mk_error(
        "mock: host_layout is NULL — the runner must demand dense "
        "row-major explicitly (see pjrt_runner.c ToHostBuffer comment)%s",
        NULL);
  if (a->host_layout->type != PJRT_Buffer_MemoryLayout_Type_Tiled)
    return mk_error("mock: host_layout must be Tiled (plugins reject "
                    "Strides here)%s",
                    NULL);
  const PJRT_Buffer_MemoryLayout_Tiled* t = &a->host_layout->tiled;
  for (size_t i = 0; i < t->minor_to_major_size; i++)
    if (t->minor_to_major[i] != (int64_t)(t->minor_to_major_size - 1 - i))
      return mk_error("mock: minor_to_major is not dense row-major%s", NULL);
  if (a->dst == NULL) { /* size query mode */
    a->dst_size = a->src->size;
    return NULL;
  }
  if (a->dst_size < a->src->size)
    return mk_error("mock: dst_size smaller than buffer%s", NULL);
  memcpy(a->dst, a->src->data, a->src->size);
  a->event = mk_event();
  return NULL;
}

/* ---- the API table ------------------------------------------------------ */

static PJRT_Api g_api_tbl;

const PJRT_Api* GetPjrtApi(void) {
  memset(&g_api_tbl, 0, sizeof g_api_tbl);
  g_api_tbl.struct_size = PJRT_Api_STRUCT_SIZE;
  g_api_tbl.pjrt_api_version.major_version = PJRT_API_MAJOR;
  g_api_tbl.pjrt_api_version.minor_version = PJRT_API_MINOR;
  g_api_tbl.PJRT_Error_Destroy = err_destroy;
  g_api_tbl.PJRT_Error_Message = err_message;
  g_api_tbl.PJRT_Error_GetCode = err_getcode;
  g_api_tbl.PJRT_Event_Await = event_await;
  g_api_tbl.PJRT_Event_Destroy = event_destroy;
  g_api_tbl.PJRT_Client_Create = client_create;
  g_api_tbl.PJRT_Client_Destroy = client_destroy;
  g_api_tbl.PJRT_Client_AddressableDevices = client_devices;
  g_api_tbl.PJRT_Client_Compile = client_compile;
  g_api_tbl.PJRT_LoadedExecutable_Destroy = loaded_destroy;
  g_api_tbl.PJRT_Client_BufferFromHostBuffer = from_host;
  g_api_tbl.PJRT_LoadedExecutable_GetExecutable = get_executable;
  g_api_tbl.PJRT_Executable_NumOutputs = num_outputs;
  g_api_tbl.PJRT_LoadedExecutable_Execute = execute;
  g_api_tbl.PJRT_Buffer_ToHostBuffer = to_host;
  g_api_tbl.PJRT_Buffer_Destroy = buffer_destroy;
  return &g_api_tbl;
}

// Native TPU inference runtime over the PJRT C API.
//
// This is the TPU-native counterpart of the reference's TensorRT C++
// runtime (reference: trt_inference/main.cpp): instead of deserializing a
// TRT .plan and enqueueing CUDA kernels + a TorchScript postprocessing
// module, it dlopens a PJRT plugin (libtpu / axon / cpu), compiles the
// exported StableHLO module of the FUSED pipeline (model + panoptic fusion
// + DGC depth — one executable, produced by tools/export_inference.py),
// feeds raw NHWC float32 frames, and reports steady-state per-frame
// latency after a warmup, matching main.cpp:207-235.
//
// Usage:
//   mgnet_pjrt_runner <pjrt_plugin.so> <model.stablehlo>
//       <compile_options.pb> [input.raw HxWx3 f32] [iters]
//
// The compile-options protobuf sidecar is emitted by the exporter (it is
// a serialized xla CompileOptionsProto for 1 replica / 1 partition).

#include <dlfcn.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

#define CHECK_OK(api, expr)                                        \
  do {                                                             \
    PJRT_Error* _err = (expr);                                     \
    if (_err) {                                                    \
      PJRT_Error_Message_Args _m;                                  \
      std::memset(&_m, 0, sizeof(_m));                             \
      _m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;        \
      _m.error = _err;                                             \
      api->PJRT_Error_Message(&_m);                                \
      std::fprintf(stderr, "PJRT error at %s:%d: %.*s\n", __FILE__, \
                   __LINE__, static_cast<int>(_m.message_size),    \
                   _m.message);                                    \
      PJRT_Error_Destroy_Args _d;                                  \
      std::memset(&_d, 0, sizeof(_d));                             \
      _d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;        \
      _d.error = _err;                                             \
      api->PJRT_Error_Destroy(&_d);                                \
      std::exit(1);                                                \
    }                                                              \
  } while (0)

static std::string read_file(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(1);
  }
  return std::string(std::istreambuf_iterator<char>(f),
                     std::istreambuf_iterator<char>());
}

static void await_event(const PJRT_Api* api, PJRT_Event* ev) {
  PJRT_Event_Await_Args a;
  std::memset(&a, 0, sizeof(a));
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = ev;
  CHECK_OK(api, api->PJRT_Event_Await(&a));
  PJRT_Event_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  CHECK_OK(api, api->PJRT_Event_Destroy(&d));
}

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <pjrt_plugin.so> <model.stablehlo> "
                 "<compile_options.pb> [input.raw|-] [iters] [H] [W]\n",
                 argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  const char* model_path = argv[2];
  const char* opts_path = argv[3];
  const char* input_path = (argc > 4 && argv[4][0] != '-') ? argv[4] : nullptr;
  const int iters = argc > 5 ? std::atoi(argv[5]) : 50;
  const int64_t arg_h = argc > 6 ? std::atoll(argv[6]) : 1024;
  const int64_t arg_w = argc > 7 ? std::atoll(argv[7]) : 2048;

  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_GLOBAL);
  if (!handle) {
    std::fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "GetPjrtApi not found: %s\n", dlerror());
    return 1;
  }
  const PJRT_Api* api = get_api();
  std::printf("PJRT api %d.%d\n", api->pjrt_api_version.major_version,
              api->pjrt_api_version.minor_version);

  // Initialize the plugin, then create the client.
  PJRT_Plugin_Initialize_Args init_args;
  std::memset(&init_args, 0, sizeof(init_args));
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  CHECK_OK(api, api->PJRT_Plugin_Initialize(&init_args));

  // Client create options: later argv entries of the form key=value or
  // key=#int (e.g. topology=v5e:1x1x1 session_id=abc remote_compile=#1).
  std::vector<PJRT_NamedValue> options;
  std::vector<std::string> opt_storage;
  opt_storage.reserve(static_cast<size_t>(argc) * 2 + 4);
  for (int i = 8; i < argc; ++i) {
    const char* eq = std::strchr(argv[i], '=');
    if (!eq) continue;
    opt_storage.emplace_back(argv[i], eq - argv[i]);     // key
    const std::string& key = opt_storage.back();
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = key.c_str();
    nv.name_size = key.size();
    if (eq[1] == '#') {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = std::atoll(eq + 2);
      nv.value_size = 1;
    } else {
      opt_storage.emplace_back(eq + 1);
      const std::string& val = opt_storage.back();
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = val.c_str();
      nv.value_size = val.size();
    }
    options.push_back(nv);
  }

  PJRT_Client_Create_Args cc;
  std::memset(&cc, 0, sizeof(cc));
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = options.data();
  cc.num_options = options.size();
  CHECK_OK(api, api->PJRT_Client_Create(&cc));
  PJRT_Client* client = cc.client;

  // First addressable device.
  PJRT_Client_AddressableDevices_Args ad;
  std::memset(&ad, 0, sizeof(ad));
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  CHECK_OK(api, api->PJRT_Client_AddressableDevices(&ad));
  if (ad.num_addressable_devices == 0) {
    std::fprintf(stderr, "no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = ad.addressable_devices[0];

  // Compile the StableHLO module (parity: engine deserialization,
  // main.cpp:57-85 — except compilation happens here, once, and could be
  // cached via PJRT_Executable_Serialize).
  std::string mlir = read_file(model_path);
  std::string copts = read_file(opts_path);

  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = mlir.data();
  program.code_size = mlir.size();
  program.format = "mlir";
  program.format_size = 4;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  auto t_compile0 = std::chrono::steady_clock::now();
  CHECK_OK(api, api->PJRT_Client_Compile(&comp));
  PJRT_LoadedExecutable* loaded = comp.executable;
  double compile_s = std::chrono::duration<double>(
                         std::chrono::steady_clock::now() - t_compile0)
                         .count();
  std::printf("compiled %s in %.1f s\n", model_path, compile_s);

  PJRT_LoadedExecutable_GetExecutable_Args ge;
  std::memset(&ge, 0, sizeof(ge));
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = loaded;
  CHECK_OK(api, api->PJRT_LoadedExecutable_GetExecutable(&ge));

  PJRT_Executable_NumOutputs_Args no;
  std::memset(&no, 0, sizeof(no));
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  CHECK_OK(api, api->PJRT_Executable_NumOutputs(&no));
  size_t num_outputs = no.num_outputs;
  std::printf("executable outputs: %zu\n", num_outputs);

  // Inputs: image [1,H,W,3] f32, K [1,3,3] f32, camera_height [1] f32.
  // Shapes follow the exporter defaults; the image file (if given) is raw
  // f32 HxWx3 (parity: image load + preprocessing, main.cpp:152-201).
  int64_t H = arg_h, W = arg_w;
  std::vector<float> image(static_cast<size_t>(H) * W * 3, 0.5f);
  if (input_path) {
    std::string raw = read_file(input_path);
    if (raw.size() != image.size() * sizeof(float)) {
      std::fprintf(stderr, "input size mismatch: got %zu want %zu\n",
                   raw.size(), image.size() * sizeof(float));
      return 1;
    }
    std::memcpy(image.data(), raw.data(), raw.size());
  }
  float K[9] = {2262.52f, 0.f, 1096.98f, 0.f, 2265.30f, 513.137f,
                0.f, 0.f, 1.f};
  float cam_height[1] = {1.22f};

  struct HostArg {
    const void* data;
    std::vector<int64_t> dims;
  };
  std::vector<HostArg> host_args = {
      {image.data(), {1, H, W, 3}},
      {K, {1, 3, 3}},
      {cam_height, {1}},
  };

  std::vector<PJRT_Buffer*> arg_buffers;
  for (auto& a : host_args) {
    PJRT_Client_BufferFromHostBuffer_Args bh;
    std::memset(&bh, 0, sizeof(bh));
    bh.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    bh.client = client;
    bh.data = a.data;
    bh.type = PJRT_Buffer_Type_F32;
    bh.dims = a.dims.data();
    bh.num_dims = a.dims.size();
    bh.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bh.device = device;
    CHECK_OK(api, api->PJRT_Client_BufferFromHostBuffer(&bh));
    await_event(api, bh.done_with_host_buffer);
    arg_buffers.push_back(bh.buffer);
  }

  // Host staging buffer for the per-frame sync readback (Execute is
  // async; reading one output back forces completion — the analog of the
  // reference's cudaStreamSynchronize, main.cpp:233).
  //
  // Two wait disciplines (BENCH_NOTES.md):
  //  * default: wait the device-complete + output-ready events. On
  //    directly-attached hardware this is exact; through a relay tunnel
  //    events can resolve optimistically, so the number is a LOWER bound.
  //  * MGNET_RUNNER_READBACK=1: additionally copy output[0] to the host
  //    every frame (PJRT_Buffer_ToHostBuffer). Always exact, but through
  //    a tunnel it adds the link round-trip — an UPPER bound there, the
  //    TRT-parity protocol on local hardware.
  std::vector<uint8_t> host_out;
  const bool readback = [] {
    const char* v = std::getenv("MGNET_RUNNER_READBACK");
    return v && v[0] == '1';
  }();

  auto copy_to_host = [&](PJRT_Buffer* buf) {
    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = buf;
    th.dst = nullptr;  // size query
    CHECK_OK(api, api->PJRT_Buffer_ToHostBuffer(&th));
    host_out.resize(th.dst_size);
    th.dst = host_out.data();
    CHECK_OK(api, api->PJRT_Buffer_ToHostBuffer(&th));
    await_event(api, th.event);
  };

  auto sync_read_output = [&](PJRT_Buffer* buf) {
    if (readback) {
      copy_to_host(buf);
      return;
    }
    // Block until the output buffer's value is computed on device.
    PJRT_Buffer_ReadyEvent_Args re;
    std::memset(&re, 0, sizeof(re));
    re.struct_size = PJRT_Buffer_ReadyEvent_Args_STRUCT_SIZE;
    re.buffer = buf;
    CHECK_OK(api, api->PJRT_Buffer_ReadyEvent(&re));
    await_event(api, re.event);
  };

  auto run_once = [&]() {
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

    PJRT_Buffer* const* arg_list = arg_buffers.data();
    std::vector<PJRT_Buffer*> outs(num_outputs, nullptr);
    PJRT_Buffer** out_list = outs.data();
    PJRT_Event* done = nullptr;

    PJRT_LoadedExecutable_Execute_Args ex;
    std::memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = loaded;
    ex.options = &opts;
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = arg_buffers.size();
    ex.output_lists = &out_list;
    ex.device_complete_events = &done;
    CHECK_OK(api, api->PJRT_LoadedExecutable_Execute(&ex));
    await_event(api, done);
    sync_read_output(outs[0]);
    for (PJRT_Buffer* b : outs) {
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = b;
      CHECK_OK(api, api->PJRT_Buffer_Destroy(&bd));
    }
  };

  // Warmup x10 then steady-state timing (main.cpp:207-235 parity).
  for (int i = 0; i < 10; ++i) run_once();
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i) run_once();
  double dt =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  std::printf("latency: %.3f ms/frame  (%.1f fps) over %d iters  [%s]\n",
              dt / iters * 1e3, iters / dt, iters,
              readback ? "per-frame host readback"
                       : "event-wait (lower bound through a relay)");

  // Completion proof: one real host readback + checksum of output[0].
  {
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* const* arg_list = arg_buffers.data();
    std::vector<PJRT_Buffer*> outs(num_outputs, nullptr);
    PJRT_Buffer** out_list = outs.data();
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args ex;
    std::memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = loaded;
    ex.options = &opts;
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = arg_buffers.size();
    ex.output_lists = &out_list;
    ex.device_complete_events = &done;
    CHECK_OK(api, api->PJRT_LoadedExecutable_Execute(&ex));
    await_event(api, done);
    copy_to_host(outs[0]);
    uint64_t checksum = 0;
    for (uint8_t b : host_out) checksum = checksum * 1099511628211ull + b;
    std::printf("output[0] readback: %zu bytes, fnv1a=%016llx\n",
                host_out.size(),
                static_cast<unsigned long long>(checksum));
    for (PJRT_Buffer* b : outs) {
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = b;
      CHECK_OK(api, api->PJRT_Buffer_Destroy(&bd));
    }
  }
  return 0;
}

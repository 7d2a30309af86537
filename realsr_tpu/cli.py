"""Command-line interface with the reference's exact flag surface.

Mirrors src/main.cpp:101-115 (usage), 441-525 (getopt loop), 527-672
(validation, format inference, file-list construction, prepadding). Flags:

    -i input-path   -o output-path   -s scale (4)
    -t tile-size    -m model-path    -g gpu-id (-1=cpu, comma list)
    -j load:proc:save  -x (tta)  -f format  -v  -h

Exit codes follow the reference: usage/validation errors return -1 (shell
sees 255). The only intentional deviations are documented where they occur.

JAX platform selection must happen before jax is imported, so main() parses
and validates args first, configures JAX_PLATFORMS for ``-g -1``, and only
then imports the engine stack.
"""

from __future__ import annotations

import getopt
import os
import sys
from typing import List, Optional, Tuple

from realsr_tpu.utils.fsutils import (
    get_file_extension,
    get_file_name_without_extension,
    list_directory,
    path_is_directory,
)


def print_usage(file=None) -> None:
    # flag-for-flag the reference usage text (main.cpp:101-115), with the
    # binary name of this framework.
    file = file or sys.stderr
    print("Usage: realsr-tpu -i infile -o outfile [options]...\n", file=file)
    print("  -h                   show this help", file=file)
    print("  -v                   verbose output", file=file)
    print("  -i input-path        input image path (jpg/png/webp) or directory", file=file)
    print("  -o output-path       output image path (jpg/png/webp) or directory", file=file)
    print("  -s scale             upscale ratio (4, default=4)", file=file)
    print("  -t tile-size         tile size (>=32/0=auto, default=0) can be 0,0,0 for multi-gpu", file=file)
    print("  -m model-path        realsr model path (default=models-DF2K_JPEG)", file=file)
    print("  -g gpu-id            gpu device to use (-1=cpu, default=auto) can be 0,1,2 for multi-gpu", file=file)
    print("  -j load:proc:save    thread count for load/proc/save (default=1:2:2) can be 1:2,2,2:2 for multi-gpu", file=file)
    print("  -x                   enable tta mode", file=file)
    print("  -f format            output image format (jpg/png/webp, default=ext/png)", file=file)


def _atoi(s: str) -> int:
    """C atoi: parse a leading integer, 0 if none."""
    s = s.strip()
    i = 0
    if i < len(s) and s[i] in "+-":
        i += 1
    j = i
    while j < len(s) and s[j].isdigit():
        j += 1
    if j == i:
        return 0
    return int(s[: j])


def parse_int_array(s: str) -> List[int]:
    """Reference parse_optarg_int_array (main.cpp:75-89): atoi per comma."""
    return [_atoi(tok) for tok in s.split(",")]


def parse_jobs(s: str) -> Tuple[int, List[int], int]:
    """Parse ``load:proc[,proc...]:save`` (main.cpp:507-508 sscanf)."""
    parts = s.split(":")
    jobs_load = _atoi(parts[0]) if parts else 1
    jobs_save = _atoi(parts[-1]) if len(parts) >= 3 else 2
    jobs_proc = parse_int_array(parts[1]) if len(parts) >= 2 else []
    return jobs_load, jobs_proc, jobs_save


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    inputpath = ""
    outputpath = ""
    scale = 4
    tilesize: List[int] = []
    model = "models-DF2K_JPEG"  # main.cpp:429 default
    gpuid: List[int] = []
    jobs_load, jobs_proc, jobs_save = 1, [], 2
    verbose = False
    tta_mode = False
    fmt = "png"

    try:
        opts, _ = getopt.getopt(argv, "i:o:s:t:m:g:j:f:vxh")
    except getopt.GetoptError:
        print_usage()
        return -1
    for opt, val in opts:
        if opt == "-i":
            inputpath = val
        elif opt == "-o":
            outputpath = val
        elif opt == "-s":
            scale = _atoi(val)
        elif opt == "-t":
            tilesize = parse_int_array(val)
        elif opt == "-m":
            model = val
        elif opt == "-g":
            gpuid = parse_int_array(val)
        elif opt == "-j":
            jobs_load, jobs_proc, jobs_save = parse_jobs(val)
        elif opt == "-f":
            fmt = val
        elif opt == "-v":
            verbose = True
        elif opt == "-x":
            tta_mode = True
        else:  # -h
            print_usage()
            return -1

    if not inputpath or not outputpath:
        print_usage()
        return -1

    if scale != 4:  # main.cpp:533-537
        print("invalid scale argument", file=sys.stderr)
        return -1

    n_dev = len(gpuid) if gpuid else 1
    if tilesize and len(tilesize) != n_dev:
        print("invalid tilesize argument", file=sys.stderr)
        return -1
    for t in tilesize:
        if t != 0 and t < 32:  # main.cpp:545-552
            print("invalid tilesize argument", file=sys.stderr)
            return -1

    if jobs_load < 1 or jobs_save < 1:
        print("invalid thread count argument", file=sys.stderr)
        return -1
    if jobs_proc and len(jobs_proc) != n_dev:
        print("invalid jobs_proc thread count argument", file=sys.stderr)
        return -1
    for j in jobs_proc:
        if j < 1:
            print("invalid jobs_proc thread count argument", file=sys.stderr)
            return -1

    # format inference from output extension (main.cpp:575-603)
    if not path_is_directory(outputpath):
        ext = get_file_extension(outputpath).lower()
        if ext == "png":
            fmt = "png"
        elif ext == "webp":
            fmt = "webp"
        elif ext in ("jpg", "jpeg"):
            fmt = "jpg"
        else:
            print("invalid outputpath extension type", file=sys.stderr)
            return -1
    if fmt not in ("png", "webp", "jpg"):
        print("invalid format argument", file=sys.stderr)
        return -1

    # input/output file lists (main.cpp:605-659)
    input_files: List[str] = []
    output_files: List[str] = []
    if path_is_directory(inputpath) and path_is_directory(outputpath):
        filenames = list_directory(inputpath)
        last_filename = ""
        last_filename_noext = ""
        for fn in filenames:
            noext = get_file_name_without_extension(fn)
            out_fn = noext + "." + fmt
            if noext == last_filename_noext:  # collision rename :628-643
                out_fn2 = fn + "." + fmt
                print(
                    f"both {fn} and {last_filename} output {out_fn} ! "
                    f"{fn} will output {out_fn2}",
                    file=sys.stderr,
                )
                out_fn = out_fn2
            else:
                last_filename = fn
                last_filename_noext = noext
            input_files.append(os.path.join(inputpath, fn))
            output_files.append(os.path.join(outputpath, out_fn))
    elif not path_is_directory(inputpath) and not path_is_directory(outputpath):
        input_files = [inputpath]
        output_files = [outputpath]
    else:
        print(
            "inputpath and outputpath must be either file or directory at the same time",
            file=sys.stderr,
        )
        return -1

    # Multi-host (DCN) mode: tiles never cross chips, so hosts never need to
    # talk — split the FILE LIST across processes, exactly as the reference
    # splits whole images across GPU queues (SURVEY.md §5). Shard identity
    # comes from env (for launchers that fan out one process per host), or
    # from an already-initialized jax.distributed runtime (process_index /
    # process_count) when the env vars are absent.
    shard = _atoi(os.environ.get("REALSR_TPU_SHARD", "-1"))
    num_shards = _atoi(os.environ.get("REALSR_TPU_NUM_SHARDS", "0"))
    if not num_shards:
        try:
            from jax._src import distributed as _jdist

            if _jdist.global_state.client is not None:  # initialized
                # read the distributed state directly — jax.process_index()
                # would initialize the backend HERE, before the '-g -1'
                # platform pinning below can take effect
                shard = _jdist.global_state.process_id or 0
                num_shards = _jdist.global_state.num_processes or 0
        except (ImportError, AttributeError):
            # private-API pin (no public way to read this pre-backend-init):
            # a jax upgrade that moves jax._src.distributed — or renames the
            # global_state fields — must not SILENTLY disable multi-host
            # file sharding; tell the user the autodetect is gone so they
            # can fall back to the env vars
            print(
                "warning: jax.distributed state probe unavailable in this "
                "jax version; multi-host autodetect disabled (set "
                "REALSR_TPU_SHARD / REALSR_TPU_NUM_SHARDS explicitly)",
                file=sys.stderr,
            )
    if num_shards > 1:
        if not (0 <= shard < num_shards):
            print("invalid REALSR_TPU_SHARD / REALSR_TPU_NUM_SHARDS", file=sys.stderr)
            return -1
        input_files = input_files[shard::num_shards]
        output_files = output_files[shard::num_shards]

    # prepadding from model dir name (main.cpp:661-672)
    if "models-DF2K" in model:
        prepadding = 10
    else:
        print("unknown model dir type", file=sys.stderr)
        return -1

    # out-of-box model resolution: committed graphs + first-use weight
    # synthesis for the default DF2K dirs (modelzoo; the reference ships
    # models/* in-tree and in releases, release.yml:55-66)
    from realsr_tpu.modelzoo import resolve_model_files

    resolved = resolve_model_files(model, scale)
    if resolved is None:
        print(
            f"model files not found under -m {model} "
            f"(x{scale}.param / x{scale}.bin)",
            file=sys.stderr,
        )
        return -1
    parampath, modelpath = resolved

    # --- JAX platform config BEFORE backend initialization ---------------
    # Env vars alone are not enough: the hosting environment may import jax
    # at interpreter start (sitecustomize), so set jax.config too — it works
    # until the first backend use (tests/conftest.py has the same note).
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the user EXPLICITLY pinned the CPU backend; a sitecustomize hook
        # may have registered an accelerator platform regardless of the env
        # var, so reassert it via jax.config (wins until first backend use)
        jax.config.update("jax_platforms", "cpu")
    if gpuid and all(g == -1 for g in gpuid):
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        # the reference gives the CPU engine `-j` proc-count OpenMP threads
        # (main.cpp:734-746); the XLA:CPU analog bounds the intra-op pool
        # at client creation — must happen before any backend use
        from realsr_tpu.utils.cputhreads import (
            configure_cpu_threads,
            notice_cpu_threads_ignored,
        )

        n_intra = jobs_proc[0] if jobs_proc else 2
        if not configure_cpu_threads(n_intra, verbose=verbose):
            notice_cpu_threads_ignored()
    elif any(g == -1 for g in gpuid):
        cur = os.environ.get("JAX_PLATFORMS", "") or None
        if cur and "cpu" not in cur.split(","):
            os.environ["JAX_PLATFORMS"] = cur + ",cpu"
            jax.config.update("jax_platforms", cur + ",cpu")

    from realsr_tpu.engine import EngineConfig, RealSR
    from realsr_tpu.pipeline import run_pipeline

    if not gpuid:
        # default = first accelerator, CPU if none (get_default_gpu_index
        # analog, main.cpp:701-704)
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        gpuid = [0 if accel else -1]
        if gpuid == [-1]:
            os.environ["JAX_PLATFORMS"] = "cpu"

    n_dev = len(gpuid)
    if not jobs_proc:
        jobs_proc = [2] * n_dev  # main.cpp:708-711
    if not tilesize:
        tilesize = [0] * n_dev

    cpu_count = os.cpu_count() or 1
    jobs_load = min(jobs_load, cpu_count)
    jobs_save = min(jobs_save, cpu_count)

    # mirror the engine's pool semantics: gpu ids index the accelerator
    # pool, or all devices on a CPU-only host (virtual meshes included)
    accel_count = len([d for d in jax.devices() if d.platform != "cpu"])
    pool_n = accel_count or len(jax.devices())
    for g in gpuid:
        if g < -1 or g >= pool_n:
            print("invalid gpu device", file=sys.stderr)
            return -1

    storage = os.environ.get("REALSR_TPU_STORAGE", "auto")

    # TPU-native multi-chip mode (additive; REALSR_TPU_MESH=all|i,j,...):
    # ONE engine whose tile batches shard over a jax.sharding.Mesh of the
    # selected devices (ICI), instead of the reference's independent
    # per-device engines stealing whole images (-g). SURVEY.md §2.2 #3:
    # the tile axis is this domain's shardable axis.
    mesh_env = os.environ.get("REALSR_TPU_MESH", "")
    mesh = None
    if mesh_env:
        from realsr_tpu.parallel.mesh import mesh_from_env

        try:
            mesh = mesh_from_env(mesh_env)
        except ValueError as ex:
            print(str(ex), file=sys.stderr)
            return -1
        gpuid = gpuid[:1]  # one mesh engine replaces the per-device pool

    engines = []
    for i, g in enumerate(gpuid):
        cfg = EngineConfig(tilesize=tilesize[i], prepadding=prepadding, storage=storage)
        e = RealSR(
            gpuid=g, tta_mode=tta_mode, num_threads=jobs_proc[i], config=cfg,
            mesh=mesh,
        )
        try:
            e.load(parampath, modelpath)
        except (ValueError, OSError, NotImplementedError) as ex:
            # corrupt/truncated/unsupported model files: clean diagnostic +
            # error exit, like ncnn's load_param/load_model failure path
            # (the reference exits on model-load failure rather than
            # crashing); NotImplementedError covers named unsupported
            # features (int8 weight records, exotic layer types)
            print(f"load model failed: {ex}", file=sys.stderr)
            return -1
        engines.append(e)
        if mesh is not None and verbose:
            print(
                f"mesh mode: {mesh.size} devices, tile batches sharded "
                f"over {mesh.axis_names[0]!r}",
                file=sys.stderr,
            )

    # Optional warm-up (additive; REALSR_TPU_PRECOMPILE=1): AOT-compile the
    # first image's program set before the pipeline starts. The per-bucket
    # compiles run concurrently (engine.precompile), so a multi-bucket shape
    # warms in ~one compile's wall time where lazy first-image compilation
    # pays each bucket serially.
    image_batch = max(1, _atoi(os.environ.get("REALSR_TPU_IMAGE_BATCH", "1")))
    if os.environ.get("REALSR_TPU_PRECOMPILE", "0") not in ("0", "") and input_files:
        try:
            # decode with the SAME codec path the pipeline uses, so the
            # channel count (gray promotion, palette transparency, tRNS
            # handling) cannot diverge from what proc_worker will see
            from realsr_tpu.io.codecs import decode_image

            img0 = decode_image(input_files[0])
            if img0 is None:
                raise ValueError(f"cannot decode {input_files[0]}")
            h0, w0, ch = img0.shape
            for e in engines:
                n = e.precompile(w0, h0, channels=ch)
                # batched-stack programs are distinct executables; warm the
                # drain size proc_worker will actually dispatch
                nb = min(image_batch, e.max_batch_images((h0, w0, ch)))
                if nb > 1:
                    n += e.precompile(w0, h0, channels=ch, n_img=nb)
                if verbose:
                    print(
                        f"precompiled {n} programs for {w0}x{h0}",
                        file=sys.stderr,
                    )
        except Exception as ex:  # warm-up must never break processing
            print(f"precompile skipped: {ex}", file=sys.stderr)

    run_pipeline(
        input_files,
        output_files,
        engines,
        jobs_proc,
        jobs_load=jobs_load,
        jobs_save=jobs_save,
        verbose=verbose,
        # opportunistic cross-image tile batching (additive feature beyond
        # the reference's one-image-per-proc-thread model)
        image_batch=image_batch,
    )
    return 0

"""Pipeline orchestrator + CLI (`python -m pintron_tpu.pipeline`).

Rebuild of the reference `pintron` driver (dist-scripts/pintron.py:764-1021):
runs the eight pipeline steps over a working directory, producing the
full-output JSON and GTF from `genomic.txt` + `ests.txt`.  Same flags,
same intermediate-file ABI, same cleanup list.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import shutil
import sys
import time


def pintron_pipeline(workdir: str = ".",
                     genome_filename: str = "genomic.txt",
                     est_filename: str = "ests.txt",
                     output_filename: str = "pintron-full-output.json",
                     gtf_filename: str = "pintron-all-isoforms.gtf",
                     gene: str = "unknown",
                     organism: str = "unknown",
                     only_cds_annot: bool = False,
                     extended_gtf_filename: str = "",
                     pipeline_logfile: str = "",
                     pas_tolerance: int = 30,
                     keep_intermediate: bool = False,
                     resume: bool = False,
                     max_factorization_time: int = 60,
                     max_factorization_memory: int = 3000,
                     max_exon_agreement_time: int = 15,
                     max_intron_agreement_time: int = 30,
                     config=None,
                     log=logging.getLogger("pintron")) -> None:
    from pintron_tpu.stages.est_fact import run_est_fact
    from pintron_tpu.stages.min_factorization import run_min_factorization
    from pintron_tpu.stages.intron_agreement import run_intron_agreement
    from pintron_tpu.stages.compact import run_compact_compositions
    from pintron_tpu.stages.transcripts import run_maximal_transcripts
    from pintron_tpu.stages.ccds import run_cds_annotation
    from pintron_tpu.stages.emit import compute_json, json2gtf

    def wpath(name: str) -> str:
        return os.path.join(workdir, name)

    # -l/--logfile: the per-step pipeline log (reference pintron.py's
    # exec_system_command appends each stage's label, command analogue
    # and exit status to options.plogfile via `2>> logfile`).  The
    # stages here run in-process, so the equivalent record is a
    # begin/end line per step with wall time and outcome.
    _plog_path = None
    if pipeline_logfile:
        _plog_path = (pipeline_logfile if os.path.isabs(pipeline_logfile)
                      else wpath(pipeline_logfile))

    def plog(label: str, msg: str) -> None:
        if _plog_path is not None:
            with open(_plog_path, "a") as f:
                f.write(f"[{label}] {msg}\n")

    def run_step(label: str, fn) -> None:
        plog(label, "begin")
        t = time.time()
        try:
            fn()
        except BaseException as e:
            plog(label, f"FAILED after {time.time() - t:.1f}s: "
                        f"{type(e).__name__}: {e}")
            raise
        plog(label, f"ok ({time.time() - t:.1f}s)")

    def run_guarded(fn, minutes: int, mem_mb: int = 0,
                    artifacts: tuple = (), jax_stage: bool = False):
        """Resource guards (reference pintron.py:878-906 `ulimit -t/-v`):
        run the stage in a forked child with RLIMIT_CPU / RLIMIT_AS plus
        a parent-side wall-clock watchdog (the child forks pool workers
        whose CPU its own rlimit cannot see), so a runaway stage aborts
        the pipeline instead of hanging it.  On failure the stage's
        declared output artifacts are removed so a later --resume cannot
        pick up a truncated checkpoint.  The stages communicate through
        files, so process isolation changes nothing on success.  Guards
        <= 0 run the stage inline.  Under PINTRON_DEVICE=1 the
        JAX-touching stages (jax_stage=True) also run inline — the TPU
        backend cannot be (re)initialized in a forked child — relying
        on the per-EST timeout ladder instead; all other stages keep
        the fork watchdog and its truncated-artifact cleanup."""
        if minutes <= 0 or (jax_stage
                            and os.environ.get("PINTRON_DEVICE")):
            fn()
            return
        import multiprocessing
        import resource as _resource

        def child():
            import resource
            cpu = minutes * 60
            try:
                resource.setrlimit(resource.RLIMIT_CPU, (cpu, cpu + 10))
                if mem_mb > 0:
                    # cap GROWTH by mem_mb on top of the mappings already
                    # inherited from the parent (a JAX-loaded parent maps
                    # gigabytes of virtual space the reference's fresh C
                    # process never had)
                    cur = 0
                    page = _resource.getpagesize()
                    try:
                        with open("/proc/self/statm") as f:
                            cur = int(f.read().split()[0]) * page
                    except (OSError, ValueError, IndexError):
                        pass
                    mem = cur + mem_mb * 1024 * 1024
                    resource.setrlimit(resource.RLIMIT_AS, (mem, mem))
            except (ValueError, OSError):
                pass
            fn()

        ctx = multiprocessing.get_context("fork")
        proc = ctx.Process(target=child)
        proc.start()
        proc.join(timeout=minutes * 60 + 30)
        timed_out = proc.is_alive()
        if timed_out:
            proc.terminate()
            proc.join(timeout=10)
        if timed_out or proc.exitcode != 0:
            for name in artifacts:
                try:
                    os.remove(wpath(name))
                except OSError:
                    pass
            raise RuntimeError(
                "stage exceeded its resource guard or failed "
                + ("(wall-clock timeout)" if timed_out
                   else f"(exit {proc.exitcode})"))

    def stage_done(*artifacts: str) -> bool:
        """Idempotent restart: the inter-stage files double as
        checkpoints (SURVEY §5 / reference DESIGN.md) -- with --resume a
        stage whose outputs already exist is skipped."""
        return resume and all(os.path.exists(wpath(a)) for a in artifacts)

    t0 = time.time()
    # Device-profiling hook (SURVEY §5: JAX profiler traces + per-stage
    # step markers): PINTRON_JAX_PROFILE=<dir> captures a trace of the
    # whole pipeline; the device batches carry TraceAnnotation markers
    # (ops/offload.py) so the K-band/PWM dispatches show up named.
    prof_dir = os.environ.get("PINTRON_JAX_PROFILE")
    if prof_dir:
        try:
            import jax
            jax.profiler.start_trace(prof_dir)
        except Exception:
            prof_dir = None
    # STEP 1: input checks (pintron.py:824-873)
    log.info("STEP  1:  Checking executables and input files...")
    for f in (genome_filename, est_filename):
        if not os.access(wpath(f), os.R_OK):
            raise FileNotFoundError(wpath(f))

    # the stage ABI uses the well-known names; stage inputs may be aliased
    if genome_filename != "genomic.txt":
        shutil.copyfile(wpath(genome_filename), wpath("genomic.txt"))
    if est_filename != "ests.txt":
        shutil.copyfile(wpath(est_filename), wpath("ests.txt"))

    # STEP 2: spliced alignment (est-fact)
    if stage_done("raw-multifasta-out.txt", "processed-ests.txt"):
        log.info("STEP  2:  [resume] spliced alignments found, skipping")
    else:
        log.info("STEP  2:  Computing the spliced alignments...")
        run_step("cmd-2-est-fact", lambda: run_guarded(
            lambda: run_est_fact(workdir, config=config),
            max_factorization_time, max_factorization_memory,
            artifacts=("raw-multifasta-out.txt",
                       "processed-ests.txt", "megs.txt",
                       "processed-megs.txt", "meg-edges.txt",
                       "processed-megs-info.txt"),
            jax_stage=True))

    # STEP 3: minimum-factorization agreement
    if stage_done("out-agree.txt"):
        log.info("STEP  3:  [resume] agreement found, skipping")
    else:
        log.info("STEP  3:  Computing the agreement of the alignments...")

        def _step3():
            with open(wpath("raw-multifasta-out.txt")) as fin, \
                    open(wpath("out-agree.txt"), "w") as fout:
                run_min_factorization(fin, fout)

        run_step("cmd-3-min-factorization", lambda: run_guarded(
            _step3, max_exon_agreement_time,
            artifacts=("out-agree.txt",)))

    # STEP 4: intron agreement + classification
    if stage_done("out-after-intron-agree.txt", "predicted-introns.txt"):
        log.info("STEP  4:  [resume] intron agreement found, skipping")
    else:
        log.info("STEP  4:  Computing the intron agreement...")
        run_step("cmd-4-intron-agreement", lambda: run_guarded(
            lambda: run_intron_agreement(workdir),
            max_intron_agreement_time,
            artifacts=("out-after-intron-agree.txt",
                       "predicted-introns.txt"),
            jax_stage=True))

    # STEP 5: composition compaction
    if stage_done("build-ests.txt", "genomic-exonforCCDS.txt"):
        log.info("STEP  5:  [resume] compacted compositions found, skipping")
    else:
        log.info("STEP  5:  Computing the final transcript alignments...")
        def _step5():
            with open(wpath("out-after-intron-agree.txt")) as fin, \
                    open(wpath("build-ests.txt"), "w") as fout:
                run_compact_compositions(fin, fout, wpath("genomic.txt"),
                                         wpath("genomic-exonforCCDS.txt"))

        run_step("cmd-5-compact-compositions", _step5)

    # STEP 6: maximal transcripts
    if stage_done("isoforms.txt"):
        log.info("STEP  6:  [resume] isoforms found, skipping")
    else:
        log.info("STEP  6:  Computing the final full-length isoforms...")
        run_step("cmd-6a-maximal-transcripts",
                 lambda: run_maximal_transcripts(workdir))
        shutil.copyfile(wpath("TRANSCRIPTS1_1.txt"), wpath("isoforms.txt"))

    # STEP 7: CDS annotation
    if stage_done("CCDS_transcripts.txt", "VariantGTF.txt"):
        log.info("STEP  7:  [resume] CDS annotation found, skipping")
    else:
        log.info("STEP  7:  Annotating CDS...")
        run_step("cmd-7-cds-annotation",
                 lambda: run_cds_annotation(workdir, gene=gene,
                                            organism=organism))

    # STEP 8: JSON + GTF emission
    log.info("STEP  8:  Saving outputs...")
    run_step("cmd-8-compute-json",
             lambda: compute_json(workdir, wpath(output_filename),
                                  pas_tolerance=pas_tolerance))
    if gtf_filename:
        json2gtf(wpath(output_filename), wpath(gtf_filename), gene,
                 not only_cds_annot)
    if extended_gtf_filename:
        # --extended-gtf: an always-complete GTF variant (every isoform
        # with full exon/UTR/codon rows) alongside the main one — under
        # --strict-GTF-compliance the main GTF is restricted to
        # CDS-annotated isoforms (reference pintron.py:232-273), and
        # this file preserves the unrestricted view
        json2gtf(wpath(output_filename), wpath(extended_gtf_filename),
                 gene, True)

    if prof_dir:
        try:
            import jax
            jax.profiler.stop_trace()
            log.info("JAX profiler trace written to %s", prof_dir)
        except Exception:
            pass

    # STEP 10: cleanup (pintron.py:974-983)
    log.info("STEP 10:  Finalizing...")
    if not keep_intermediate:
        tempfiles = [
            "TEMP_COMPOSITION_TRANS1_1.txt", "TEMP_COMPOSITION_TRANS1_2.txt",
            "TEMP_COMPOSITION_TRANS1_3.txt", "TEMP_COMPOSITION_TRANS1_4.txt",
            "TRANSCRIPTS1_1.txt", "TRANSCRIPTS1_2.txt", "TRANSCRIPTS1_3.txt",
            "TRANSCRIPTS1_4.txt", "VariantGTF.txt", "build-ests.txt",
            "CCDS_transcripts.txt", "config-dump.ini",
            "genomic-exonforCCDS.txt", "isoforms.txt", "meg-edges.txt",
            "megs.txt", "out-after-intron-agree.txt", "out-agree.txt",
            "out-fatt.txt", "predicted-introns.txt", "processed-ests.txt",
            "processed-megs-info.txt", "processed-megs.txt",
            "raw-multifasta-out.txt", "time-limits", "info-pid-*.log",
        ]
        for name in tempfiles:
            for p in glob.glob(wpath(name)):
                try:
                    os.remove(p)
                except OSError:
                    pass
    log.info("Pipeline completed in %.1fs", time.time() - t0)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="pintron",
        description="TPU-native PIntron: gene-structure prediction by "
                    "spliced alignment of ESTs/mRNAs")
    p.add_argument("-g", "--genomic", dest="genome_filename",
                   default="genomic.txt")
    p.add_argument("-s", "--EST", dest="est_filename", default="ests.txt")
    p.add_argument("-o", "--output", dest="output_filename",
                   default="pintron-full-output.json")
    p.add_argument("-t", "--gtf", dest="gtf_filename",
                   default="pintron-all-isoforms.gtf")
    p.add_argument("--extended-gtf", dest="extended_gtf", default=None)
    p.add_argument("--strict-GTF-compliance", dest="only_cds_annot",
                   action="store_true", default=False)
    p.add_argument("-e", "--gene", dest="gene", default="unknown")
    p.add_argument("-n", "--organism", dest="organism", default="unknown")
    p.add_argument("-k", "--keep-intermediate-files", dest="no_clean",
                   action="store_true", default=False)
    p.add_argument("-l", "--logfile", dest="plogfile",
                   default="pintron-pipeline-log.txt")
    p.add_argument("--general-logfile", dest="glogfile",
                   default="pintron-log.txt")
    p.add_argument("-b", "--bin-dir", dest="bindir", default="")
    p.add_argument("-z", "--compress", dest="compress", action="store_true",
                   default=False)
    p.add_argument("--pas-tolerance", dest="pas_tolerance", type=int,
                   default=30)
    p.add_argument("--set-max-factorization-time", type=int, default=60)
    p.add_argument("--set-max-factorization-memory", type=int, default=3000)
    p.add_argument("--set-max-exon-agreement-time", type=int, default=15)
    p.add_argument("--set-max-intron-agreement-time", type=int, default=30)
    p.add_argument("--workdir", default=".")
    p.add_argument("--resume", action="store_true",
                   help="skip stages whose output artifacts already "
                        "exist (the inter-stage files are idempotent "
                        "checkpoints)")
    args = p.parse_args(argv)

    # dual-sink logging (reference pintron.py:986-1002 prepare_loggers):
    # DEBUG+ to --general-logfile, INFO+ to the console
    glogfile = args.glogfile
    if glogfile and not os.path.isabs(glogfile):
        glogfile = os.path.join(args.workdir, glogfile)
    root = logging.getLogger("")
    root.setLevel(logging.DEBUG)
    if glogfile:
        fh = logging.FileHandler(glogfile, mode="w")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(
            "%(levelname)s:%(name)s:%(asctime)s%(msecs)d:%(message)s",
            datefmt="%Y%m%d-%H%M%S"))
        root.addHandler(fh)
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter(
        "[%(levelname)-8s] %(asctime)s - %(message)s"))
    root.addHandler(console)

    if args.bindir:
        # every stage is built into pintron_tpu; there are no external
        # stage executables for --bin-dir to locate
        logging.getLogger("pintron").warning(
            "--bin-dir=%s ignored: all pipeline stages are built in",
            args.bindir)

    pintron_pipeline(
        workdir=args.workdir,
        genome_filename=args.genome_filename,
        est_filename=args.est_filename,
        output_filename=args.output_filename,
        gtf_filename=args.gtf_filename,
        gene=args.gene,
        organism=args.organism,
        only_cds_annot=args.only_cds_annot,
        extended_gtf_filename=args.extended_gtf or "",
        pipeline_logfile=args.plogfile or "",
        pas_tolerance=args.pas_tolerance,
        keep_intermediate=args.no_clean,
        resume=args.resume,
        max_factorization_time=args.set_max_factorization_time,
        max_factorization_memory=args.set_max_factorization_memory,
        max_exon_agreement_time=args.set_max_exon_agreement_time,
        max_intron_agreement_time=args.set_max_intron_agreement_time,
    )
    if args.compress:
        # reference pintron.py:965-972 gzips the JSON and both logfiles
        import gzip
        for src in (os.path.join(args.workdir, args.output_filename),
                    os.path.join(args.workdir, args.plogfile)
                    if args.plogfile and not os.path.isabs(args.plogfile)
                    else args.plogfile,
                    glogfile):
            if not src or not os.path.exists(src):
                continue
            with open(src, "rb") as fi, gzip.open(src + ".gz", "wb") as fo:
                shutil.copyfileobj(fi, fo)
            os.remove(src)
    return 0


if __name__ == "__main__":
    sys.exit(main())

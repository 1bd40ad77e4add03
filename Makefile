# Task runner (rebuild of the reference's /pixi.toml task list): one target
# per benchmark scene, composing {dataset}.yaml + neural_graph_map.yaml +
# coslam_eval.yaml + newton_eval.yaml exactly like `pixi run <scene>`.
# Set NGM_DATA_DIR to the dataset root. Pass NGM_EXTRA_ARGS for overrides.

PY ?= python
RUN = $(PY) -m neural_graph_mapping_tpu.run_mapping --config
EVAL = neural_graph_map.yaml newton_eval.yaml coslam_eval.yaml

.PHONY: test bench synthetic entry-check \
        nrgbd_br nrgbd_ck nrgbd_gr nrgbd_gwr nrgbd_ma nrgbd_tg nrgbd_wr \
        replica_room0 replica_room1 replica_room2 replica_office0 \
        replica_office1 replica_office2 replica_office3 replica_office4 \
        replica_big_apartment0 replica_big_apartment1 replica_big_apartment2 \
        scannet_0000 scannet_0059 scannet_0106 scannet_0169 scannet_0181 \
        scannet_0207 kintinuous_loop

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

entry-check:
	JAX_PLATFORMS= XLA_FLAGS="--xla_force_host_platform_device_count=8" \
	$(PY) -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; fn, a = g.entry(); jax.jit(fn)(*a); g.dryrun_multichip(8)"

synthetic:
	$(RUN) neural_graph_map.yaml synthetic.yaml $(NGM_EXTRA_ARGS)

# --- Neural RGB-D scenes (reference pixi.toml:93-132) ---
nrgbd_br:  ; $(RUN) nrgbd_dataset.yaml $(EVAL) --dataset_config.scene breakfast_room $(NGM_EXTRA_ARGS)
nrgbd_ck:  ; $(RUN) nrgbd_dataset.yaml $(EVAL) --dataset_config.scene complete_kitchen $(NGM_EXTRA_ARGS)
nrgbd_gr:  ; $(RUN) nrgbd_dataset.yaml $(EVAL) --dataset_config.scene green_room $(NGM_EXTRA_ARGS)
nrgbd_gwr: ; $(RUN) nrgbd_dataset.yaml $(EVAL) --dataset_config.scene grey_white_room $(NGM_EXTRA_ARGS)
nrgbd_ma:  ; $(RUN) nrgbd_dataset.yaml $(EVAL) --dataset_config.scene morning_apartment $(NGM_EXTRA_ARGS)
nrgbd_tg:  ; $(RUN) nrgbd_dataset.yaml $(EVAL) --dataset_config.scene thin_geometry $(NGM_EXTRA_ARGS)
nrgbd_wr:  ; $(RUN) nrgbd_dataset.yaml $(EVAL) --dataset_config.scene whiteroom $(NGM_EXTRA_ARGS)

# --- Replica scenes (reference pixi.toml:105-150; .PHONY targets cannot
# use pattern rules, so every scene gets an explicit rule like nrgbd) ---
REPLICA_IMAP = room0 room1 room2 office0 office1 office2 office3 office4
$(addprefix replica_,$(REPLICA_IMAP)):
	$(RUN) replica_imap_dataset.yaml $(EVAL) \
	  --dataset_config.scene $(subst replica_,,$@) $(NGM_EXTRA_ARGS)

REPLICA_BIG = apartment0 apartment1 apartment2
$(addprefix replica_big_,$(REPLICA_BIG)):
	$(RUN) replica_big_dataset.yaml $(EVAL) \
	  --dataset_config.scene $(subst replica_big_,,$@) $(NGM_EXTRA_ARGS)

# --- ScanNet scenes (reference pixi.toml:152-163) ---
SCANNET = 0000 0059 0106 0169 0181 0207
$(addprefix scannet_,$(SCANNET)):
	$(RUN) scannet_dataset.yaml $(EVAL) \
	  --dataset_config.scene scene$(subst scannet_,,$@)_00 $(NGM_EXTRA_ARGS)

kintinuous_loop:
	$(RUN) kintinuous_dataset.yaml neural_graph_map.yaml \
	  --dataset_config.scene loop $(NGM_EXTRA_ARGS)

# Convenience targets mirroring the reference's build/run scripts
# (Makefile + run.sh/test.sh/performance.sh/live-test.sh).
.PHONY: test parity soak perf demo live oracle train league clean

test:            ## conformance + unit suites (CPU, 8 virtual devices)
	python -m pytest tests/ -q

parity:          ## C++ oracle parity suites only
	python -m pytest tests/test_parity.py tests/test_simple_agent.py -q

soak:            ## deep conformance soak (game-length x 100+ seeds; ~30-60 min)
	python -m pytest tests/test_soak.py -m soak -q

perf:            ## single-chip throughput benchmark (JSON line)
	python bench.py

demo:            ## rendered SimpleAgent game (reference run.sh)
	python scripts/play_demo.py

live:            ## step-by-step rendered game (reference live-test.sh)
	python scripts/play_demo.py --pause

oracle:          ## build the C++ parity oracle from /root/reference
	sh tools/build_oracle.sh

train:           ## short self-play PPO run
	python scripts/train_ppo.py --batch 128 --iters 10

league:          ## Elo ladder over scripted + trained generations (CPU)
	python scripts/league.py --cpu --all4 \
	  --roster simple,random,ppo:gen0,ppo:gen1 \
	  --ckpt gen0=artifacts/ppo_vs_simple,gen1=artifacts/ppo_randseat \
	  --rounds 16 --games 32 --steps 800

clean:
	rm -rf build/oracle_dump build/jax_cache __pycache__

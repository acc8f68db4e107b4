"""Deterministic mock Ethereum chain (FIXTURES.md §8): a pure function of
block number, importable on Spark workers via ``AGN_RPC_MOCK=
tests.mock_chain:transport``."""

from __future__ import annotations

from agnostic_blockchain_etl_spark.functions.hex import (evm_hex_decode_int,
                                                         evm_hex_encode_int)
from agnostic_blockchain_etl_spark.functions.keccak import keccak256
from agnostic_blockchain_etl_spark.functions.rpc import MockTransport

CHAIN_TIP = 149
GENESIS_TS = 1600000000


def block_hash(n: int) -> bytes:
    return keccak256(b"block:" + n.to_bytes(8, "big"))


def miner(n: int) -> bytes:
    return keccak256(b"miner:" + (n % 5).to_bytes(1, "big"))[:20]


def make_block(n: int) -> dict:
    return {
        "timestamp": evm_hex_encode_int(GENESIS_TS + 12 * n),
        "number": evm_hex_encode_int(n),
        "hash": "0x" + block_hash(n).hex(),
        "parentHash": "0x" + (block_hash(n - 1).hex() if n > 0 else "00" * 32),
        "miner": "0x" + miner(n).hex(),
        "gasLimit": evm_hex_encode_int(30_000_000),
        "gasUsed": evm_hex_encode_int(1_000_000 + 137 * n % 29_000_000),
        "baseFeePerGas": evm_hex_encode_int(10 ** 9 + n * 13),
        "size": evm_hex_encode_int(500 + n % 1000),
        "extraData": "0x" + (b"mock" + (n % 256).to_bytes(1, "big")).hex(),
    }


def serve(method: str, params: list):
    if method == "eth_blockNumber":
        return evm_hex_encode_int(CHAIN_TIP)
    if method == "eth_getBlockByNumber":
        n = evm_hex_decode_int(params[0], "UInt64")
        if n > CHAIN_TIP:
            return None
        return make_block(n)
    raise RuntimeError(f"mock chain: unsupported method {method}")


def transport() -> MockTransport:
    return MockTransport(serve)

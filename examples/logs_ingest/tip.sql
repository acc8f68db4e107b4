-- Finalized-head tip (reference: examples/ethereum_blocks/tip.sql:1-8):
-- the tip is the block tagged {{.LATEST_BLOCK_STATUS}} ('finalized' by
-- default) so unfinalized heads — and therefore reorgs — never enter the
-- sink; pass LATEST_BLOCK_STATUS=latest to trade safety for freshness.
SELECT evm_hex_decode_int(
           get_json_object(
               ethereum_rpc('eth_getBlockByNumber',
                            array('{{.LATEST_BLOCK_STATUS | default "finalized"}}', 'false'),
                            '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'),
               '$.value.number'),
           'UInt64') AS tip

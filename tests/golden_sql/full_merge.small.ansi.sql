DELETE FROM resources w WHERE 1=1 AND NOT EXISTS (SELECT 1 FROM stg t WHERE t."href" = w."href");

MERGE INTO resources w USING stg t ON t."href" = w."href" WHEN MATCHED AND (w."jsondata" <> t."jsondata" OR (w."jsondata" IS NULL AND t."jsondata" IS NOT NULL) OR (w."jsondata" IS NOT NULL AND t."jsondata" IS NULL)) THEN UPDATE SET "modified" = t."modified", "jsondata" = t."jsondata", "resourcetype" = t."resourcetype" WHEN NOT MATCHED THEN INSERT ("href", "key", "modified", "jsondata", "resourcetype") VALUES (t."href", t."key", t."modified", t."jsondata", t."resourcetype");
